"""Live closed-loop demo (parity with /root/reference/run_predictions.py):
a PID driver steers the env while the diffusion policy periodically samples
a trajectory from the rolling observation window; predictions are overlaid
on the augmented render (`env.add_points2Buffer` equivalent) and exported
as a video.

--drive policy goes beyond the reference: once the observation ring is
full the policy's own predicted actions drive the car (denoise every
step_size frames, execute the 0.1s-ahead action row — the bench.py
closed-loop semantics), still with trajectory overlays."""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--predict_every", type=int, default=50)
    p.add_argument("--track_seed", type=int, default=42)
    p.add_argument("--mode", default="middle")
    p.add_argument("--target_velocity", type=float, default=30.0)
    p.add_argument("--sampler", default="ddim")
    p.add_argument("--num_inference_steps", type=int, default=10)
    p.add_argument("--ddim_spacing", default="leading",
                   choices=["leading", "trailing"])
    p.add_argument("--ema", action="store_true",
                   help="load the EMA weights (checkpoints_ema/, runs "
                        "trained with --ema_decay) instead of raw params")
    p.add_argument("--gaussian_init", action="store_true",
                   help="N(0,1) sampler init instead of the reference quirk")
    p.add_argument("--drive", default="pid", choices=["pid", "policy"],
                   help="pid = reference demo (PID drives, policy overlays"
                        " predictions); policy = the policy drives itself")
    p.add_argument("--out", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from state_policy_diffusionmodel_tpu import (
        control, diffusion, envs, track as T, train)
    from state_policy_diffusionmodel_tpu.data import normalize as N
    from state_policy_diffusionmodel_tpu.data.dataset import load_stats
    from state_policy_diffusionmodel_tpu.render import Overlay, raster
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
    params = train.checkpoints.load_checkpoint(
        train.checkpoints.latest_checkpoint(
            args.run_dir,
            subdir="checkpoints_ema" if args.ema else "checkpoints"), tmpl)
    stats = load_stats(os.path.join(args.run_dir, "STATS.pkl"))

    geom = T.build(T.make_track(args.track_seed))
    state, res = jax.jit(envs.reset)(geom)
    ctrl_params = control.lane_follow_params(args.mode, args.target_velocity)
    ctrl = control.lane_follow_init()

    # jit the hot per-step functions: eager dispatch would round-trip the
    # device once per op
    ctrl_jit = jax.jit(control.lane_follow)
    step_plain = jax.jit(lambda s, a: envs.step(s, geom, a))
    step_overlay = jax.jit(lambda s, a, ov: envs.step(s, geom, a, overlay=ov))

    # rolling raw observation ring buffers (run_predictions.py:30-60):
    # length obs_horizon * step_size, subsampled [::step_size]
    L = cfg.obs_horizon * cfg.step_size
    hist = {"image": [], "position": [], "velocity": [], "action": []}
    frames = []
    rng = jax.random.key(args.seed)
    overlay_pts = []
    max_lines = 8

    sample_jit = jax.jit(lambda p, b, r: policy.sample(
        p, b, r, sampler=args.sampler,
        num_inference_steps=args.num_inference_steps,
        ddim_spacing=args.ddim_spacing))

    action = jnp.zeros(3)
    policy_action = None
    for step in range(args.steps):
        speed = jnp.linalg.norm(res.info.car_velocity)
        action, ctrl = ctrl_jit(ctrl_params, ctrl, res.augmented, speed)
        hist["image"].append(np.asarray(res.obs, np.float32) / 255.0)
        hist["position"].append(np.asarray(res.info.car_position))
        hist["velocity"].append(np.asarray(res.info.car_velocity))
        hist["action"].append(np.asarray(action))
        for k in hist:
            hist[k] = hist[k][-L:]

        overlay = None
        ring_full = len(hist["position"]) >= L
        every = (cfg.step_size if args.drive == "policy"
                 else args.predict_every)
        if ring_full and step % every == 0:
            sub = {k: np.stack(v[::cfg.step_size])[None]
                   for k, v in hist.items()}
            npos, trans = N.normalize_position(sub["position"][0],
                                               stats["position"])
            batch = {
                "image": jnp.asarray(sub["image"]),
                "position": jnp.asarray(npos)[None],
                "velocity": jnp.asarray(N.normalize_data(
                    sub["velocity"], stats["velocity"])),
                "action": jnp.asarray(N.normalize_data(
                    sub["action"], stats["action"])),
            }
            rng, s = jax.random.split(rng)
            pred = np.asarray(sample_jit(params, batch, s))[0]
            world = N.unnormalize_position(pred[:, :2], trans,
                                           stats["position"])
            # in policy mode the sampler runs every step_size frames for
            # control; only every predict_every-th trajectory is overlaid
            # (all of them would web the frame in red)
            if args.drive != "policy" or step % args.predict_every == 0:
                overlay_pts.append(world.astype(np.float32))
                overlay_pts = overlay_pts[-max_lines:]
            if args.drive == "policy":
                acts = N.unnormalize_data(pred[:, 2:5], stats["action"])
                policy_action = jnp.asarray(
                    np.asarray(acts)[cfg.inpaint_horizon])
        if overlay_pts:
            pts = np.zeros((max_lines, cfg.horizon, 2), np.float32)
            valid = np.zeros(max_lines, bool)
            for i, w in enumerate(overlay_pts):
                pts[i], valid[i] = w, True
            overlay = Overlay(jnp.asarray(pts), jnp.asarray(valid))

        if args.drive == "policy" and policy_action is not None:
            action = policy_action        # held for step_size frames
            # the ring must record the EXECUTED action for this frame
            hist["action"][-1] = np.asarray(action)
        if overlay is None:
            state, res = step_plain(state, action)
        else:
            state, res = step_overlay(state, action, overlay)
        frames.append(np.asarray(res.augmented))
        if bool(res.done):
            break

    out = args.out or os.path.join(args.run_dir, "run_predictions.mp4")
    path = plotting.save_animation(frames, out, fps=25)
    print("wrote", path, f"({len(frames)} frames)")


if __name__ == "__main__":
    main()
