#!/usr/bin/env bash
# Round-3i: few-step sampler study on a converged checkpoint.
#
# The sampler-cost curve (run_r3g.sh stage 5) showed DDIM-5 runs the
# closed loop at ~50k frames/s vs ~30k at DDIM-10 — if a 5-step sampler
# drives as well as DDIM-10, the closed-loop headline nearly doubles at
# equal driving quality.  This study measures, on a converged run
# (default tb_logs/r3h; the original target tb_logs/r3e, val 0.0345,
# was destroyed by a host reset — its full-battery numbers survive in
# results/eval_r3e_*.json):
#   - open-loop position accuracy: ddim vs dpmpp (DPM-Solver++(2M),
#     second-order — added this round) at 5 and 10 steps, gaussian init;
#   - closed-loop driving metrics + frames/s for the promising configs.
#
# Usage: run_r3i_sampler_study.sh [run_tag]   (run_tag names tb_logs/<tag>)
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
# NOTE: no persistent compile cache — executing cache-deserialized
# executables over the axon tunnel stalls/hangs (round-4 finding, bench.py)

RUN=${1:-r3h}
DATA_DIR=./data/r3
EVAL_ZARR=r3_eval_dataset_1_episodes_1_modes.zarr
RUN_DIR=./tb_logs/$RUN

mkdir -p results

for CFG in "ddim 5" "dpmpp 5" "ddim 10" "dpmpp 10"; do
  set -- $CFG
  S=$1; N=$2
  OUT=results/eval_${RUN}_${S}${N}_gauss.json
  [ -f "$OUT" ] || \
  python -m cli.evaluate accuracy --run_dir "$RUN_DIR" \
    --dataset_dir "$DATA_DIR" --dataset_name "$EVAL_ZARR" \
    --max_windows 60 --sampler $S --num_inference_steps $N \
    --gaussian_init --out "$OUT"
done

for CFG in "ddim 5" "dpmpp 5" "dpmpp 10"; do
  set -- $CFG
  S=$1; N=$2
  OUT=results/bench_policy_${RUN}_${S}${N}_gauss.json
  [ -f "$OUT" ] || \
  python bench.py --mode policy --envs 256 --run_dir "$RUN_DIR" \
    --gaussian_init --sampler $S --num_inference_steps $N \
    | tee "$OUT"
done

echo "R3I DONE"
