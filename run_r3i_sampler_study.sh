#!/usr/bin/env bash
# Round-3i: few-step sampler study on the converged r3e checkpoint.
#
# The sampler-cost curve (run_r3g.sh stage 5) showed DDIM-5 runs the
# closed loop at ~50k frames/s vs ~30k at DDIM-10 — if a 5-step sampler
# drives as well as DDIM-10, the closed-loop headline nearly doubles at
# equal driving quality.  This study measures, on tb_logs/r3e (val 0.0345):
#   - open-loop position accuracy: ddim vs dpmpp (DPM-Solver++(2M),
#     second-order — added this round) at 5 and 10 steps, gaussian init;
#   - closed-loop driving metrics + frames/s for the promising configs.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache

DATA_DIR=./data/r3
EVAL_ZARR=r3_eval_dataset_1_episodes_1_modes.zarr
RUN_DIR=./tb_logs/r3e

mkdir -p results

for CFG in "ddim 5" "dpmpp 5" "ddim 10" "dpmpp 10"; do
  set -- $CFG
  S=$1; N=$2
  OUT=results/eval_r3e_${S}${N}_gauss.json
  [ -f "$OUT" ] || \
  python -m cli.evaluate accuracy --run_dir "$RUN_DIR" \
    --dataset_dir "$DATA_DIR" --dataset_name "$EVAL_ZARR" \
    --max_windows 60 --sampler $S --num_inference_steps $N \
    --gaussian_init --out "$OUT"
done

for CFG in "ddim 5" "dpmpp 5" "dpmpp 10"; do
  set -- $CFG
  S=$1; N=$2
  OUT=results/bench_policy_r3e_${S}${N}_gauss.json
  [ -f "$OUT" ] || \
  python bench.py --mode policy --envs 256 --run_dir "$RUN_DIR" \
    --gaussian_init --sampler $S --num_inference_steps $N \
    | tee "$OUT"
done

echo "R3I DONE"
