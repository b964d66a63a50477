"""Headline benchmark: vmapped CarRacing env steps/sec/chip (step + render).

Target (BASELINE.md): >= 100,000 env steps/sec/chip at 1024 parallel envs
with 96x96 rendering. The reference steps ONE env serially on CPU with two
OpenGL rasterizations + glReadPixels per step (car_racing.py:459,498-599);
here thousands of envs step and render inside one jitted lax.scan.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline` is value / 100000 (the driver-supplied north-star; the
reference repo publishes no numbers of its own).

Modes (--mode): env_render (default, the headline), env_only,
policy (closed-loop DDIM-10 diffusion-policy rollout steps/sec).
"""

import argparse
import json
import sys
import time
from functools import partial

import numpy as np


def build_geoms(n_envs: int, n_unique: int, bake: bool):
    import jax
    from state_policy_diffusionmodel_tpu import track as T

    tracks = [T.build(T.make_track(100 + i), bake=bake)
              for i in range(n_unique)]
    reps = [tracks[i % n_unique] for i in range(n_envs)]
    return T.stack(reps)


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_env(n_envs: int, n_steps: int, repeats: int, render: bool,
              n_unique_tracks: int):
    import jax
    import jax.numpy as jnp
    from state_policy_diffusionmodel_tpu import envs

    from state_policy_diffusionmodel_tpu import track as T
    from state_policy_diffusionmodel_tpu.envs.vector import gather_geom

    t0 = time.perf_counter()
    # a bank of unique tracks indexed per env: 1024 envs sharing 16 tracks
    # costs 32 MB of texture HBM instead of 2 GB
    geoms = T.stack([T.build(T.make_track(100 + i), bake=render)
                     for i in range(n_unique_tracks)])
    track_ids = jnp.arange(n_envs, dtype=jnp.int32) % n_unique_tracks
    _log(f"[bench] built {n_unique_tracks} tracks for {n_envs} envs "
         f"in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    states = jax.jit(envs.vector.init_batch)(geoms, track_ids)
    jax.block_until_ready(states.reward)
    _log(f"[bench] reset in {time.perf_counter() - t0:.1f}s")
    actions = jnp.tile(jnp.array([0.05, 0.6, 0.0], jnp.float32), (n_envs, 1))

    @partial(jax.jit, donate_argnums=0)
    def run(states, geoms, track_ids, actions):
        # every step's frames are folded into a carried checksum: rendering
        # cannot be dead-code-eliminated, and memory stays flat (no stacked
        # trajectory)
        def body(carry, _):
            ss, chk = carry
            ss, res = envs.vector.step_batch(ss, geoms, actions,
                                             render=render,
                                             track_ids=track_ids)
            ss = jax.vmap(
                lambda s, t: envs.auto_reset(s, gather_geom(geoms, t))
            )(ss, track_ids)
            chk = chk + res.reward.sum()
            if render:
                chk = chk + res.obs.astype(jnp.uint32).sum().astype(
                    jnp.float32) * 1e-9
            return (ss, chk), None

        (states, chk), _ = jax.lax.scan(
            body, (states, jnp.float32(0.0)), None, length=n_steps)
        return states, chk

    # compile + warmup.  NOTE: device->host value fetch, not just
    # block_until_ready — the axon tunnel acks readiness before the remote
    # computation finishes, so only a dependent transfer gives honest timing.
    t0 = time.perf_counter()
    states, chk = run(states, geoms, track_ids, actions)
    chk_val = float(chk)
    _log(f"[bench] compile+warmup in {time.perf_counter() - t0:.1f}s "
         f"(chk={chk_val:.3f})")

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        states, chk = run(states, geoms, track_ids, actions)
        chk_val = float(chk)
        times.append(time.perf_counter() - t0)
    _log(f"[bench] times={['%.3f' % t for t in times]} chk={chk_val:.3f}")
    best = min(times)
    return n_envs * n_steps / best


def bench_policy(n_envs: int, repeats: int, amp: bool = True,
                 profile_dir: str | None = None):
    """Closed-loop diffusion policy: envs step at 50 Hz sim time; every
    `step_size` frames the policy denoises (DDIM-10) from the rolling obs
    window and commits the next actions — all inside one jit.  amp=True
    runs the U-Net/encoder forwards in bfloat16 (scheduler math fp32)."""
    import jax
    import jax.numpy as jnp
    from state_policy_diffusionmodel_tpu import diffusion, envs

    cfg = diffusion.PolicyConfig(
        noise_steps=1000, obs_horizon=10, pred_horizon=30, inpaint_horizon=1,
        model="UNet_Film", vision_encoder="autoencoder", step_size=5)
    pol = diffusion.DiffusionPolicy(cfg)
    params = pol.init_params(jax.random.key(0))

    n_unique = min(4, n_envs)
    geoms = build_geoms(n_unique, n_unique, bake=True)
    track_ids = jnp.arange(n_envs, dtype=jnp.int32) % n_unique
    states, res0 = envs.vector.reset_batch(geoms, render=True,
                                           track_ids=track_ids)

    T_obs = cfg.obs_horizon
    n_frames = cfg.step_size * 10  # 10 policy invocations per measured run

    def rollout(states, obs_hist, rng):
        """obs_hist: dict of (B, T_obs, ...) rolling windows; images are
        cached as encoder features (each frame encoded once, not re-encoded
        per denoise pass)."""

        def policy_step(carry, _):
            states, hist, rng, actions_queue, k = carry
            rng, sub = jax.random.split(rng)
            # denoise every step_size frames
            def denoise(_):
                out = pol.sample(params, hist, sub, sampler="ddim",
                                 num_inference_steps=10, amp=amp)
                return out[:, cfg.inpaint_horizon:, 2:5]  # (B, pred, 3)
            actions_queue = jax.lax.cond(
                k % cfg.step_size == 0, denoise,
                lambda _: actions_queue, None)
            a = actions_queue[:, (k // cfg.step_size) % cfg.pred_horizon]
            states, res = envs.vector.step_batch(states, geoms, a, render=True,
                                                 track_ids=track_ids)
            # roll the obs history
            def roll(h, new):
                return jnp.concatenate([h[:, 1:], new[:, None]], axis=1)
            enc_params = params
            frame = (res.obs.astype(jnp.float32) / 255.0)[:, None]
            if amp:
                enc_params = jax.tree.map(
                    lambda v: v.astype(jnp.bfloat16)
                    if v.dtype == jnp.float32 else v, params)
                frame = frame.astype(jnp.bfloat16)
            feats = pol.encode_images(enc_params, frame).astype(jnp.float32)
            hist = {
                "image_features": roll(hist["image_features"], feats[:, 0]),
                "position": roll(hist["position"], res.info.car_position),
                "velocity": roll(hist["velocity"], res.info.car_velocity),
                "action": roll(hist["action"], a),
            }
            return (states, hist, rng, actions_queue, k + 1), res.reward

        queue0 = jnp.zeros((n_envs, cfg.pred_horizon, 3))
        (states, obs_hist, rng, _, _), rewards = jax.lax.scan(
            policy_step, (states, obs_hist, rng, queue0, 0), None,
            length=n_frames)
        return states, obs_hist, rewards.sum()

    rollout = jax.jit(rollout)
    hist = {
        "image_features": jnp.zeros((n_envs, T_obs, cfg.vision_latent)),
        "position": jnp.zeros((n_envs, T_obs, 2)),
        "velocity": jnp.zeros((n_envs, T_obs, 2)),
        "action": jnp.zeros((n_envs, T_obs, 3)),
    }
    rng = jax.random.key(0)
    states, hist, chk = rollout(states, hist, rng)
    float(chk)   # fetch a VALUE: the tunnel acks block_until_ready early
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        states, hist, chk = rollout(states, hist, rng)
        float(chk)
        times.append(time.perf_counter() - t0)
    if profile_dir:
        from state_policy_diffusionmodel_tpu.utils import profiling
        with profiling.trace(profile_dir):
            states, hist, chk = rollout(states, hist, rng)
            float(chk)
        _log(f"[bench] jax.profiler trace written to {profile_dir}")
    frames_per_sec = n_envs * n_frames / min(times)
    return frames_per_sec


def main():
    # persistent compilation cache: round-over-round bench runs skip XLA
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="env_render",
                    choices=["env_render", "env_only", "policy"])
    ap.add_argument("--envs", type=int, default=None,
                    help="default: 1024 (env modes), 256 (policy mode — the "
                         "throughput/latency sweet spot for the DDIM loop)")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--unique-tracks", type=int, default=16)
    ap.add_argument("--no-amp", action="store_true",
                    help="policy mode: run the denoiser in fp32 instead of bf16")
    ap.add_argument("--profile-dir", default=None,
                    help="policy mode: capture one jax.profiler trace of the "
                         "measured rollout into this directory")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes for CPU smoke testing")
    args = ap.parse_args()
    if args.envs is None:
        args.envs = 256 if args.mode == "policy" else 1024

    if args.smoke:
        args.envs, args.steps, args.repeats = 8, 20, 1
        args.unique_tracks = 2

    if args.mode == "policy":
        value = bench_policy(max(args.envs // 16, 1) if args.smoke else args.envs,
                             args.repeats, amp=not args.no_amp,
                             profile_dir=args.profile_dir)
        # real time = 50 sim frames per wall second per env
        realtime_factor = value / (50.0 * args.envs)
        out = {
            "metric": "closed_loop_policy_frames_per_sec",
            "value": round(value, 1),
            "unit": "env frames/s (DDIM-10 policy in loop)",
            "vs_baseline": round(realtime_factor, 3),
        }
    else:
        render = args.mode == "env_render"
        value = bench_env(args.envs, args.steps, args.repeats, render,
                          args.unique_tracks)
        out = {
            "metric": f"{args.mode}_steps_per_sec_per_chip",
            "value": round(value, 1),
            "unit": f"env steps/s at {args.envs} envs"
                    + (" incl 96x96 render" if render else ""),
            "vs_baseline": round(value / 100_000.0, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
