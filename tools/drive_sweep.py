"""In-process driving-metric sweep: every checkpoint row in ONE process.

Per-process bench invocations each pay 10-15 min of remote compile through
the axon tunnel (and a killed invocation leaves its compile queued
server-side). All same-architecture checkpoints share identical HLO —
bench_policy threads params as jit ARGUMENTS — so one process + the
persistent compile cache turns N rows into ~1 compile per (architecture,
sampler-config) family.

Usage: python tools/drive_sweep.py [--out results/r5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = [
    # name, run_dir, kwargs
    ("r3h_raw_ddim10", "tb_logs/r3h", {}),
    ("r4b_ema_ddim10", "tb_logs/r4b", {"ema": True}),
    ("r4b_raw_ddim10", "tb_logs/r4b", {}),
    ("r4sin_ema_ddim10", "tb_logs/r4sin", {"ema": True}),
    ("r4sin_raw_ddim10", "tb_logs/r4sin", {}),
    # mid-run probes: does longer training trade driving for open-loop acc?
    ("r4b_raw_ep45", "tb_logs/r4b", {"epoch": 45}),
    ("r4b_raw_ep90", "tb_logs/r4b", {"epoch": 90}),
    ("r4b_raw_ep149", "tb_logs/r4b", {"epoch": 149}),
    # quality levers on the incumbent (different static config => their own
    # compiles, still cached in-process across future reruns)
    ("r3h_trailing", "tb_logs/r3h", {"ddim_spacing": "trailing"}),
    ("r3h_interp", "tb_logs/r3h", {"interp_actions": True}),
    ("r3h_ddim20", "tb_logs/r3h", {"num_inference_steps": 20}),
    # the ResNet18 encoder policy (second architecture family)
    ("r4rn_ema_ddim10", "tb_logs/r4rn", {"ema": True}),
    ("r4rn_raw_ddim10", "tb_logs/r4rn", {}),
    # trailing-spacing follow-ups (r3h_trailing measured +34% tiles/min)
    ("r3h_ddim5_trailing", "tb_logs/r3h",
     {"ddim_spacing": "trailing", "num_inference_steps": 5}),
    ("r4sin_ema_trailing", "tb_logs/r4sin",
     {"ddim_spacing": "trailing", "ema": True}),
    ("r4b_ema_trailing", "tb_logs/r4b",
     {"ddim_spacing": "trailing", "ema": True}),
    # the round-5 blend-dataset policy
    ("r5blend_ema_ddim10", "tb_logs/r5blend", {"ema": True}),
    ("r5blend_ema_trailing", "tb_logs/r5blend",
     {"ema": True, "ddim_spacing": "trailing"}),
    ("r5blend_ema_ddim5_trailing", "tb_logs/r5blend",
     {"ema": True, "ddim_spacing": "trailing", "num_inference_steps": 5}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/r5")
    ap.add_argument("--rows", default=None,
                    help="comma-separated row names (default: all)")
    args = ap.parse_args()

    import jax
    cache = os.environ.get("SPDM_BENCH_CACHE", "/tmp/jax_bench_cache_r5")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import bench

    only = set(args.rows.split(",")) if args.rows else None
    os.makedirs(args.out, exist_ok=True)
    for name, run_dir, kw in ROWS:
        path = os.path.join(args.out, f"drive_{name}.json")
        if only is not None and name not in only:
            continue
        if os.path.exists(path) and os.path.getsize(path) > 0:
            with open(path) as f:
                if '"partial"' not in f.read():
                    print(f"[sweep] {name}: exists, skip", flush=True)
                    continue
        print(f"[sweep] measuring {name} ...", flush=True)
        _, driving = bench.bench_policy(
            n_envs=256, repeats=1, amp=True, run_dir=run_dir,
            gaussian_init=True, metrics_frames=1500, metrics_repeats=5,
            n_unique_tracks=8, metrics_only=True, **kw)
        out = {"metric": "closed_loop_driving", "row": name,
               "driving": driving}
        with open(path, "w") as f:
            json.dump(out, f)
        print(f"[sweep] {name}: {driving}", flush=True)


if __name__ == "__main__":
    main()
