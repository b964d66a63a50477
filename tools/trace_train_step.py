"""Capture a jax.profiler trace of the B=256 amp train step and print the
per-op device-time table (round-5 directive-3c: the measured floor
analysis behind the 11.4% train-step MFU).

Usage: python tools/trace_train_step.py [--out /tmp/train_prof]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/train_prof")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    cache = os.environ.get("SPDM_BENCH_CACHE", "/tmp/jax_bench_cache_r5")
    jax.config.update("jax_compilation_cache_dir", cache)

    from state_policy_diffusionmodel_tpu import diffusion, train

    # the cli/mfu.py train-step configuration, verbatim
    cfg = diffusion.PolicyConfig(
        noise_steps=1000, obs_horizon=10, pred_horizon=30,
        inpaint_horizon=1, model="UNet_Film",
        vision_encoder="autoencoder", step_size=5)
    pol = diffusion.DiffusionPolicy(cfg)
    params = pol.init_params(jax.random.key(0))
    tcfg = train.TrainConfig(batch_size=args.batch, lr=1e-4, amp=True)
    opt = train.make_optimizer(tcfg)
    opt_state = opt.init(params)
    step = jax.jit(train.make_train_step(pol, opt, amp=True))
    B, T = args.batch, cfg.obs_horizon + cfg.pred_horizon
    batch = {
        "position": jnp.zeros((B, T, 2)), "action": jnp.zeros((B, T, 3)),
        "velocity": jnp.zeros((B, T, 2)),
        "image": jnp.zeros((B, T, 96, 96, 3)),
    }
    rng, lr = jax.random.key(1), jnp.asarray(1e-4)
    out = step(params, opt_state, batch, rng, lr)
    jax.block_until_ready(out)
    with jax.profiler.trace(args.out):
        for _ in range(3):
            out = step(params, opt_state, batch, rng, lr)
        jax.block_until_ready(out)
    print("trace written to", args.out, flush=True)

    import subprocess
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "trace_topops.py"),
                    args.out, str(args.top)])


if __name__ == "__main__":
    main()
