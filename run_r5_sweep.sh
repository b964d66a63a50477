#!/bin/bash
# Round-5 directive-1/5 sweep: crack the open-loop vs closed-loop divergence.
#
# Part A — driving metrics with VARIANCE BARS: every candidate checkpoint
#   {r3h raw, r4b ema/raw, r4sin ema/raw, r4rn ema/raw} x DDIM-10 (plus
#   DDIM-5 on the winner), 5 repeats over an 8-track bank (rotated
#   assignment + fresh rng per repeat). This includes the round-4 queued
#   r4b RAW check (bench_policy_r4b_raw_gauss.json, VERDICT weak-1).
#
# Part B — SHARED open-loop protocol: one fixed 6-episode eval set
#   (2 lane-follow + 2 center-follow + 2 sinusoidal, seeds 900+,
#   tools/make_shared_evalset.py) scored with the DEPLOYED sampler config
#   (DDIM-10, gaussian init) for every model — position error AND the new
#   action-head metrics, so we can see which open-loop metric predicts
#   tiles/min.
#
# Part C — mid-cosine EMA value check (VERDICT weak-6): r4b epoch-89 EMA vs
#   epoch-90 raw on the shared set.
#
# Idempotent: every stage is guarded by its output file.
#
# EXECUTION NOTE (how round 5 actually ran): per-process bench/eval
# invocations each paid 10-15 min of remote compile through the axon
# tunnel (stats arrays are baked into the jitted programs as constants,
# so even same-architecture checkpoints with different STATS.pkl miss
# the persistent cache). The sweep was therefore executed by the
# IN-PROCESS equivalents — tools/drive_sweep.py + tools/eval_sweep.py —
# which amortize one compile per (architecture, sampler-config, stats)
# family. This script remains the reference for WHAT was measured.
set -e
cd "$(dirname "$0")"
mkdir -p results/r5

SHARED_DIR=data/eval_shared
SHARED_ZARR=shared_eval_dataset_6_episodes_3_drivers.zarr
[ -d "$SHARED_DIR/$SHARED_ZARR" ] || \
  python tools/make_shared_evalset.py --out "$SHARED_DIR"

drive () {  # name run_dir extra-flags...
  local name=$1 rd=$2; shift 2
  [ -f "results/r5/drive_${name}.json" ] || \
  timeout 900 python bench.py --mode policy --envs 256 --run_dir "$rd" \
    --gaussian_init --metrics-frames 1500 --metrics-repeats 5 \
    --unique-tracks 8 --repeats 1 "$@" \
    | tee "results/r5/drive_${name}.json"
}

evalacc () {  # name run_dir extra-flags...
  local name=$1 rd=$2; shift 2
  [ -f "results/r5/acc_${name}.json" ] || \
  timeout 900 python -m cli.evaluate accuracy --run_dir "$rd" \
    --dataset_dir "$SHARED_DIR" --dataset_name "$SHARED_ZARR" \
    --gaussian_init --sampler ddim --num_inference_steps 10 \
    --max_windows 120 --out "results/r5/acc_${name}.json" "$@"
}

# ---- Part A: driving sweep -------------------------------------------------
drive r3h_raw_ddim10   tb_logs/r3h
drive r4b_ema_ddim10   tb_logs/r4b  --ema
drive r4b_raw_ddim10   tb_logs/r4b
drive r4sin_ema_ddim10 tb_logs/r4sin --ema
drive r4sin_raw_ddim10 tb_logs/r4sin
drive r4rn_ema_ddim10  tb_logs/r4rn --ema
drive r4rn_raw_ddim10  tb_logs/r4rn

# ---- Part B: shared open-loop protocol (deployed sampler config) -----------
evalacc r3h_raw   tb_logs/r3h
evalacc r4b_ema   tb_logs/r4b  --ema
evalacc r4b_raw   tb_logs/r4b
evalacc r4sin_ema tb_logs/r4sin --ema
evalacc r4sin_raw tb_logs/r4sin
evalacc r4rn_ema  tb_logs/r4rn --ema
evalacc r4rn_raw  tb_logs/r4rn

# ---- Part C: mid-cosine EMA vs raw (r4b, ~epoch 90 of 180) -----------------
evalacc r4b_ema_ep89 tb_logs/r4b --ema --epoch 89
evalacc r4b_raw_ep89 tb_logs/r4b --epoch 89

echo "=== r5 sweep complete; results in results/r5/ ==="
