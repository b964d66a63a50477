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
# r4b closed-loop check with RAW weights (EMA drove at 171 tiles/min vs
# r3h's 285 despite better open-loop accuracy — raw-vs-EMA isolates
# whether that is a weights effect or rollout variance)
[ -f results/bench_policy_r4b_raw_gauss.json ] || \
python bench.py --mode policy --envs 256 --run_dir ./tb_logs/r4b \
  --gaussian_init | tee results/bench_policy_r4b_raw_gauss.json

# MFU after the true-bf16 amp change (round-3 amp helped 0% at B=256
# because only the batch was cast; VERDICT item 7 target: >20% train MFU)
[ -f results/mfu_r4_amp.json ] || \
python -m cli.mfu --train_batch 256 --amp --out results/mfu_r4_amp.json
[ -f results/mfu_r4_fp32.json ] || \
python -m cli.mfu --train_batch 256 --out results/mfu_r4_fp32.json

echo "R4 DPMPP FIX DONE"
