"""In-process shared-protocol open-loop eval sweep (one process, one
compile per architecture — same rationale as tools/drive_sweep.py).

Scores every checkpoint on the fixed shared eval set with the DEPLOYED
sampler config, reporting position error + action-head error + SIGNED
action bias (the shrink-toward-mean diagnostic).

Usage: python tools/eval_sweep.py [--out results/r5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARED_DIR = "data/eval_shared"
SHARED_ZARR = "shared_eval_dataset_6_episodes_3_drivers.zarr"

ROWS = [
    # name, run_dir, {ema, epoch, ddim_spacing, num_inference_steps}
    ("r3h_raw", "tb_logs/r3h", {}),
    ("r3h_raw_trailing", "tb_logs/r3h", {"ddim_spacing": "trailing"}),
    ("r4b_ema", "tb_logs/r4b", {"ema": True}),
    ("r4b_raw", "tb_logs/r4b", {}),
    ("r4b_ema_trailing", "tb_logs/r4b",
     {"ema": True, "ddim_spacing": "trailing"}),
    ("r4sin_ema", "tb_logs/r4sin", {"ema": True}),
    ("r4sin_raw", "tb_logs/r4sin", {}),
    ("r4b_ema_ep89", "tb_logs/r4b", {"ema": True, "epoch": 89}),
    ("r4b_raw_ep89", "tb_logs/r4b", {"epoch": 89}),
    ("r4rn_ema", "tb_logs/r4rn", {"ema": True}),
    ("r4rn_raw", "tb_logs/r4rn", {}),
    ("r5blend_ema", "tb_logs/r5blend", {"ema": True}),
    ("r5blend_ema_trailing", "tb_logs/r5blend",
     {"ema": True, "ddim_spacing": "trailing"}),
]


def run_row(run_dir, ema=False, epoch=None, ddim_spacing="leading",
            num_inference_steps=10, max_windows=120):
    import dataclasses

    import jax
    from state_policy_diffusionmodel_tpu import diffusion, eval as E, train
    from state_policy_diffusionmodel_tpu.data.dataset import (
        DataModule, load_stats)

    hp = train.checkpoints.load_hparams(
        os.path.join(run_dir, "hparams.yaml"))
    cfg = diffusion.PolicyConfig(**{
        k: hp[k] for k in (
            "noise_steps", "obs_horizon", "pred_horizon", "inpaint_horizon",
            "prediction_dim", "model", "noise_scheduler_type", "step_size",
            "time_dim", "vision_encoder", "vision_latent", "uniform_init",
            "train_encoder", "model_width") if k in hp})
    cfg = dataclasses.replace(cfg, uniform_init=False)   # gaussian init
    policy = diffusion.DiffusionPolicy(cfg)
    tmpl = policy.init_params(jax.random.key(0))
    subdir = "checkpoints_ema" if ema else "checkpoints"
    ckpt = (os.path.join(run_dir, subdir, f"epoch={epoch}")
            if epoch is not None
            else train.checkpoints.latest_checkpoint(run_dir, subdir))
    params = train.checkpoints.load_checkpoint(ckpt, tmpl)
    stats = load_stats(os.path.join(run_dir, "STATS.pkl"))
    dm = DataModule(batch_size=1, data_dir=SHARED_DIR,
                    T_obs=cfg.obs_horizon, T_pred=cfg.pred_horizon,
                    stats=stats, step_size=cfg.step_size)
    dm.setup(SHARED_ZARR)
    ctx = E.EvalContext(policy=policy, params=params, dataset=dm.data_full,
                        sampler="ddim",
                        num_inference_steps=num_inference_steps,
                        ddim_spacing=ddim_spacing)
    out = E.position_accuracy(ctx, max_windows)
    import numpy as np
    return {k: (np.asarray(v).tolist()
                if isinstance(v, (np.ndarray, np.generic)) else v)
            for k, v in out.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/r5")
    ap.add_argument("--rows", default=None)
    args = ap.parse_args()

    import jax
    cache = os.environ.get("SPDM_BENCH_CACHE", "/tmp/jax_bench_cache_r5")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    only = set(args.rows.split(",")) if args.rows else None
    os.makedirs(args.out, exist_ok=True)
    for name, run_dir, kw in ROWS:
        if only is not None and name not in only:
            continue
        path = os.path.join(args.out, f"acc_{name}.json")
        if os.path.exists(path) and os.path.getsize(path) > 0:
            print(f"[eval] {name}: exists, skip", flush=True)
            continue
        print(f"[eval] scoring {name} ...", flush=True)
        res = run_row(run_dir, **kw)
        with open(path, "w") as f:
            json.dump({"accuracy": res}, f)
        brief = {k: res[k] for k in (
            "overall", "action_overall", "action_mae_gas",
            "action_bias_gas", "action_bias_steer")}
        print(f"[eval] {name}: {brief}", flush=True)


if __name__ == "__main__":
    main()
