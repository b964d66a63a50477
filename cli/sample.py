"""Offline sampling + denoising animation CLI (parity with
/root/reference/generate.py)."""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True,
                   help="training run dir (hparams.yaml + STATS.pkl + checkpoints)")
    p.add_argument("--dataset_dir", default="./data")
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--model_name", default="DDPM",
                   choices=["DDPM", "DDIM", "DPMPP"],
                   help="DPMPP = DPM-Solver++(2M), beyond-reference: "
                        "lower error than DDIM at equal steps, same cost")
    p.add_argument("--num_inference_steps", type=int, default=100)
    p.add_argument("--ddim_spacing", default="leading",
                   choices=["leading", "trailing"])
    p.add_argument("--ema", action="store_true",
                   help="load the EMA weights (checkpoints_ema/, runs "
                        "trained with --ema_decay) instead of raw params")
    p.add_argument("--gaussian_init", action="store_true",
                   help="N(0,1) sampler init instead of the reference quirk")
    p.add_argument("--ddim_compat_100", action="store_true",
                   help="replicate generate.py's 100-step DDIM scheduler swap")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import time
    import jax
    import numpy as np
    from state_policy_diffusionmodel_tpu import diffusion, train
    from state_policy_diffusionmodel_tpu.data.dataset import DataModule, load_stats
    from state_policy_diffusionmodel_tpu.utils import plotting

    hp = train.checkpoints.load_hparams(
        os.path.join(args.run_dir, "hparams.yaml"))
    cfg = diffusion.PolicyConfig(**{
        k: hp[k] for k in (
            "noise_steps", "obs_horizon", "pred_horizon", "inpaint_horizon",
            "prediction_dim", "model", "noise_scheduler_type", "step_size",
            "time_dim", "vision_encoder", "vision_latent", "uniform_init",
            "train_encoder", "model_width") if k in hp})
    if args.gaussian_init:
        import dataclasses
        cfg = dataclasses.replace(cfg, uniform_init=False)
    policy = diffusion.DiffusionPolicy(cfg)
    tmpl = policy.init_params(jax.random.key(0))
    ckpt = train.checkpoints.latest_checkpoint(
            args.run_dir,
            subdir="checkpoints_ema" if args.ema else "checkpoints")
    params = train.checkpoints.load_checkpoint(ckpt, tmpl)
    stats = load_stats(os.path.join(args.run_dir, "STATS.pkl"))

    dm = DataModule(batch_size=1, data_dir=args.dataset_dir,
                    T_obs=cfg.obs_horizon, T_pred=cfg.pred_horizon,
                    stats=stats, step_size=cfg.step_size)
    dm.setup(args.dataset_name)
    batch_np = dm.data_full.batch(dm.val_idx[:1])
    batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}

    sampler = {"DDIM": "ddim", "DPMPP": "dpmpp"}.get(args.model_name, "ddpm")
    t0 = time.time()
    hist = policy.sample(params, batch, jax.random.key(args.seed),
                         sampler=sampler,
                         num_inference_steps=args.num_inference_steps,
                         history=True, ddim_compat_100=args.ddim_compat_100,
                         ddim_spacing=args.ddim_spacing)
    hist = np.asarray(jax.device_get(hist))
    print(f"sampling took {time.time() - t0:.2f}s "
          f"({hist.shape[0] - 1} denoise steps)")

    out_dir = args.out_dir or os.path.join(args.run_dir, "samples")
    os.makedirs(out_dir, exist_ok=True)
    pos_path = plotting.denoising_animation(
        hist, os.path.join(out_dir, f"{args.model_name}_positions.mp4"),
        kind="positions")
    act_path = plotting.denoising_animation(
        hist, os.path.join(out_dir, f"{args.model_name}_actions.mp4"),
        kind="actions")
    print("wrote", pos_path, "and", act_path)


if __name__ == "__main__":
    main()
