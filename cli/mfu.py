"""MFU (model-FLOPs utilization) table for the denoiser and train step.

The reference has no counterpart (its only profiling is Lightning's
wall-time table, /root/reference/train.py:106); this tool exists because
BASELINE.md tracks how far the U-Net compute sits from the chip's peak.

For each measured program it reports:
  - analytical FLOPs from XLA's cost model (`compiled.cost_analysis()`),
  - measured device time per execution — K executions chained inside one
    `lax.scan` dispatch, so the axon tunnel's per-dispatch latency
    (~20-30 ms) amortizes away instead of dominating the number,
  - achieved TFLOP/s and MFU vs the chip's bf16 peak.

  python -m cli.mfu                 # denoiser fwd B=256/1024 + train step
  python -m cli.mfu --peak 197e12   # override the peak (TFLOP/s)
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 peak by device kind; v5e ("TPU v5 lite") = 197 TFLOP/s bf16.
PEAKS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}

K_INNER = 10   # executions per dispatch


def _peak(override):
    if override:
        return float(override)
    kind = jax.devices()[0].device_kind
    for k, v in PEAKS.items():
        if k.lower() in kind.lower():
            return v
    return 197e12


def _time_scanned(scanned, args, repeats=5):
    """Median wall seconds per inner execution: each call runs K_INNER
    chained executions in one dispatch, timed by a dependent VALUE fetch
    (through the axon tunnel block_until_ready acks before the remote
    computation finishes — see bench.py)."""
    float(scanned(*args))  # compile + warmup
    best = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(scanned(*args))
        best.append(time.perf_counter() - t0)
    return float(np.median(best)) / K_INNER


def _flops(jitted, *args):
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--peak", default=None, help="bf16 peak FLOP/s override")
    ap.add_argument("--batches", default="256,1024",
                    help="denoiser forward batch sizes")
    ap.add_argument("--train_batch", type=int, default=16)
    ap.add_argument("--amp", action="store_true",
                    help="train step with bf16 compute (TrainConfig.amp)")
    ap.add_argument("--model_width", type=int, default=None,
                    help="U-Net base channels (None = reference 64 plan)")
    ap.add_argument("--out", default=None, help="write rows as JSON here")
    args = ap.parse_args()

    from state_policy_diffusionmodel_tpu import diffusion, train

    peak = _peak(args.peak)
    print(f"device: {jax.devices()[0].device_kind}, "
          f"assumed bf16 peak {peak/1e12:.0f} TFLOP/s")

    # UNet_Film, obs 10 / pred 30; width None = the reference channel plan
    cfg = diffusion.PolicyConfig(model_width=args.model_width)
    pol = diffusion.DiffusionPolicy(cfg)
    params = pol.init_params(jax.random.key(0))
    rows = []

    def row(name, flops, secs):
        tf = flops / secs / 1e12
        rows.append({"program": name, "gflops": flops / 1e9,
                     "ms": secs * 1e3, "tflops_per_sec": tf,
                     "mfu_pct": 100.0 * flops / secs / peak})
        print(f"{name:34s} {flops/1e9:10.2f} GF {secs*1e3:9.3f} ms "
              f"{tf:8.1f} TF/s  MFU {rows[-1]['mfu_pct']:5.1f}%")

    # --- denoiser forward (closed-loop inference config: bf16 params) ------
    uparams_bf16 = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        params["unet"])
    for B in [int(b) for b in args.batches.split(",")]:
        x = jnp.zeros((B, cfg.horizon, cfg.prediction_dim, 1), jnp.bfloat16)
        t = jnp.zeros((B,), jnp.int32)
        cond = jnp.zeros((B, cfg.obs_horizon * cfg.observation_dim),
                         jnp.bfloat16)

        @jax.jit
        def fwd(p, x, t, cond):
            return pol.unet.apply({"params": p}, x, t, cond)

        @jax.jit
        def fwd_k(p, x, t, cond):
            # K executions of the compiled body inside one dispatch; the
            # accumulator chain keeps them ordered, and scan's compile-once
            # body prevents cross-iteration CSE
            def body(acc, _):
                out = pol.unet.apply({"params": p}, x, t, cond)
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=K_INNER)
            return acc

        flops = _flops(fwd, uparams_bf16, x, t, cond)
        secs = _time_scanned(fwd_k, (uparams_bf16, x, t, cond))
        wtag = "" if args.model_width is None else f" w={args.model_width}"
        row(f"denoiser fwd bf16 B={B}{wtag}", flops, secs)

    # --- train step (fp32, batch 16: the reference recipe) ------------------
    tcfg = train.TrainConfig(batch_size=args.train_batch, lr=1e-4,
                             amp=args.amp)
    opt = train.make_optimizer(tcfg)
    opt_state = opt.init(params)
    step = train.make_train_step(pol, opt, amp=args.amp)
    B = args.train_batch
    T = cfg.obs_horizon + cfg.pred_horizon
    batch = {
        "position": jnp.zeros((B, T, 2)), "action": jnp.zeros((B, T, 3)),
        "velocity": jnp.zeros((B, T, 2)),
        "image": jnp.zeros((B, T, 96, 96, 3)),
    }
    rng = jax.random.key(1)
    lr = jnp.asarray(1e-4)

    @jax.jit
    def step_k(params, opt_state, batch, rng, lr):
        def body(carry, _):
            p, o, r = carry
            r, sub = jax.random.split(r)
            p, o, loss = step(p, o, batch, sub, lr)
            return (p, o, r), loss
        (_, _, _), losses = jax.lax.scan(
            body, (params, opt_state, rng), None, length=K_INNER)
        return losses.sum()

    flops = _flops(step, params, opt_state, batch, rng, lr)
    secs = _time_scanned(step_k, (params, opt_state, batch, rng, lr))
    prec = "amp-bf16" if args.amp else "fp32"
    wtag = "" if args.model_width is None else f" w={args.model_width}"
    row(f"train step {prec} B={B}{wtag} (w/ encoder)", flops, secs)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"device": jax.devices()[0].device_kind,
                       "peak_flops": peak, "rows": rows}, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
