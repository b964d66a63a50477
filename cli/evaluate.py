"""Evaluation suite CLI (the maintained version of
/root/reference/evaluation/*.py — see eval/suite.py).

  python -m cli.evaluate --run_dir ... --dataset_name ... consistency-positions
  python -m cli.evaluate ... all
"""

from __future__ import annotations

import argparse
import json
import os

EVALS = ["consistency-positions", "consistency-actions", "precision",
         "robustness", "accuracy", "compare", "smoke"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("eval", choices=EVALS + ["all"])
    p.add_argument("--run_dir", required=True)
    p.add_argument("--dataset_dir", default="./data")
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--window", type=int, default=70)
    p.add_argument("--n_runs", type=int, default=5)
    p.add_argument("--track_seed", type=int, default=42)
    p.add_argument("--sampler", default="ddim",
                   choices=["ddim", "ddpm", "dpmpp"],
                   help="dpmpp = DPM-Solver++(2M), second-order multistep: "
                        "lower error than DDIM at equal steps, same cost")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--ema", action="store_true",
                   help="load the EMA weights (checkpoints_ema/, runs "
                        "trained with --ema_decay) instead of raw params")
    p.add_argument("--gaussian_init", action="store_true",
                   help="init reverse diffusion from N(0,1) instead of the "
                        "reference's uniform-[0,1) quirk (large accuracy "
                        "win for DDIM; see RESULTS_r3)")
    p.add_argument("--ddim_spacing", default="leading",
                   choices=["leading", "trailing"],
                   help="trailing removes the few-step DDIM bias "
                        "(leading = diffusers/reference default)")
    p.add_argument("--max_windows", type=int, default=None)
    p.add_argument("--epoch", type=int, default=None,
                   help="load this specific epoch's checkpoint instead of "
                        "the latest (mid-run EMA-vs-raw comparisons)")
    p.add_argument("--out", default=None, help="write results JSON here")
    args = p.parse_args()

    import dataclasses

    import jax
    import numpy as np
    from state_policy_diffusionmodel_tpu import diffusion, eval as E, train
    from state_policy_diffusionmodel_tpu.data.dataset import DataModule, load_stats

    hp = train.checkpoints.load_hparams(
        os.path.join(args.run_dir, "hparams.yaml"))
    cfg = diffusion.PolicyConfig(**{
        k: hp[k] for k in (
            "noise_steps", "obs_horizon", "pred_horizon", "inpaint_horizon",
            "prediction_dim", "model", "noise_scheduler_type", "step_size",
            "time_dim", "vision_encoder", "vision_latent", "uniform_init",
            "train_encoder", "model_width") if k in hp})
    if args.gaussian_init:
        cfg = dataclasses.replace(cfg, uniform_init=False)
    policy = diffusion.DiffusionPolicy(cfg)
    tmpl = policy.init_params(jax.random.key(0))
    subdir = "checkpoints_ema" if args.ema else "checkpoints"
    ckpt = (os.path.join(args.run_dir, subdir, f"epoch={args.epoch}")
            if args.epoch is not None
            else train.checkpoints.latest_checkpoint(args.run_dir, subdir))
    if args.epoch is not None and not os.path.isdir(ckpt):
        raise FileNotFoundError(f"no checkpoint at {ckpt}")
    params = train.checkpoints.load_checkpoint(ckpt, tmpl)
    stats = load_stats(os.path.join(args.run_dir, "STATS.pkl"))

    dm = DataModule(batch_size=1, data_dir=args.dataset_dir,
                    T_obs=cfg.obs_horizon, T_pred=cfg.pred_horizon,
                    stats=stats, step_size=cfg.step_size)
    dm.setup(args.dataset_name)
    ctx = E.EvalContext(policy=policy, params=params, dataset=dm.data_full,
                        track_seed=args.track_seed, sampler=args.sampler,
                        num_inference_steps=args.num_inference_steps,
                        ddim_spacing=args.ddim_spacing)

    def run_one(name):
        w, n = args.window, args.n_runs
        if name == "consistency-positions":
            return E.position_consistency(ctx, w, n)
        if name == "consistency-actions":
            return E.action_consistency(ctx, w, n)
        if name == "precision":
            return E.precision(ctx, w, n)
        if name == "robustness":
            return E.robustness(ctx, w, n)
        if name == "accuracy":
            return E.position_accuracy(ctx, args.max_windows)
        if name == "compare":
            return E.compare_position_actions(ctx, w)
        if name == "smoke":
            fig = (os.path.splitext(args.out)[0] + "_smoke_overlay.png"
                   if args.out else None)
            return E.smoke(ctx, 0, fig_path=fig)
        raise ValueError(name)

    results = {}
    for name in (EVALS if args.eval == "all" else [args.eval]):
        print(f"=== {name} ===")
        out = run_one(name)
        summary = {k: (np.asarray(v).tolist() if isinstance(
            v, (np.ndarray, np.generic)) else v)
            for k, v in out.items()
            if not (hasattr(v, "size") and np.asarray(v).size > 200)}
        results[name] = summary
        print(json.dumps(summary, default=str)[:1200])

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, default=str, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
