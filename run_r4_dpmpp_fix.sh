#!/usr/bin/env bash
# Re-measure DPM-Solver++(2M) after the x0-space inpaint fix
# (diffusion/schedules.py x0_fix). r3i measured the x_t-overwrite variant:
# dpmpp-5 12.4 u / 129 tiles/min, dpmpp-10 6.1 u / 201 tiles/min.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
RUN=r3h
for N in 5 10; do
  OUT=results/eval_${RUN}_dpmpp${N}fix_gauss.json
  [ -f "$OUT" ] || \
  python -m cli.evaluate accuracy --run_dir ./tb_logs/$RUN \
    --dataset_dir ./data/r3 \
    --dataset_name r3_eval_dataset_1_episodes_1_modes.zarr \
    --max_windows 60 --sampler dpmpp --num_inference_steps $N \
    --gaussian_init --out "$OUT"
done
[ -f results/bench_policy_${RUN}_dpmpp5fix_gauss.json ] || \
python bench.py --mode policy --envs 256 --run_dir ./tb_logs/$RUN \
  --gaussian_init --sampler dpmpp --num_inference_steps 5 \
  | tee results/bench_policy_${RUN}_dpmpp5fix_gauss.json
echo "R4 DPMPP FIX DONE"
