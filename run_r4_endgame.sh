#!/usr/bin/env bash
# Final round-4 measurement batch (run manually after cutting r4rn short).
set -uo pipefail
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site

# 1. r4rn eval battery (short: 30 windows) + metrics copy
cp ./tb_logs/r4rn/metrics.jsonl results/train_metrics_r4rn.jsonl
[ -f results/eval_r4rn_ema_gauss.json ] || \
timeout 900 python -m cli.evaluate all --run_dir ./tb_logs/r4rn \
  --dataset_dir ./data/r3 --dataset_name r3_eval_dataset_1_episodes_1_modes.zarr \
  --max_windows 30 --gaussian_init --ema \
  --out results/eval_r4rn_ema_gauss.json

# 2. dpmpp x0-fix re-measurement
for N in 5 10; do
  OUT=results/eval_r3h_dpmpp${N}fix_gauss.json
  [ -f "$OUT" ] || \
  timeout 900 python -m cli.evaluate accuracy --run_dir ./tb_logs/r3h \
    --dataset_dir ./data/r3 \
    --dataset_name r3_eval_dataset_1_episodes_1_modes.zarr \
    --max_windows 60 --sampler dpmpp --num_inference_steps $N \
    --gaussian_init --out "$OUT"
done
[ -f results/bench_policy_r3h_dpmpp5fix_gauss.json ] || \
timeout 600 python bench.py --mode policy --envs 256 --run_dir ./tb_logs/r3h \
  --gaussian_init --sampler dpmpp --num_inference_steps 5 \
  | tee results/bench_policy_r3h_dpmpp5fix_gauss.json

# 3. MFU with true-bf16 amp
[ -f results/mfu_r4_amp.json ] || \
timeout 900 python -m cli.mfu --train_batch 256 --amp --out results/mfu_r4_amp.json

# 4. final headline env_render verification
timeout 400 python bench.py | tee results/bench_env_render_r4.json

echo "R4 ENDGAME DONE"
