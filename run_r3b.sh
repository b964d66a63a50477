#!/usr/bin/env bash
# Round-3b: extend the r3 policy run past the reference's lr early-stop
# (which fired at epoch 50 with val_loss still descending — faithful to
# EarlyStopping(monitor='lr', patience=n_epochs//10) but quality-limiting)
# and evaluate with the reference's actual sampler (evaluation/*.py sample
# with full DDPM: eval_acurracy_diffusion_positions.py:127 model.sample on
# Diffusion_DDPM = 1000 steps).  Idempotent: resume skips finished epochs.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache

DATA_DIR=./data/r3
TRAIN_ZARR=r3_dataset_10_episodes_5_modes.zarr
EVAL_ZARR=r3_eval_dataset_1_episodes_1_modes.zarr
RUN=r3

# NOTE: originally --n_epochs 300; stopped at epoch 178 once the lr had
# plateau-decayed to 1e-20 (without the reference's lr-monitor early stop
# nothing halts the decay; the model froze ~epoch 100 at val 0.0368).
# 179 makes the resume a no-op so re-runs go straight to the evals.
python -m cli.train_policy --dataset_dir "$DATA_DIR" \
  --dataset_name "$TRAIN_ZARR" --n_epochs 179 --batch_size 16 \
  --device_data --version $RUN --resume --no_early_stop
cp ./tb_logs/$RUN/metrics.jsonl results/train_metrics_r3.jsonl

# reference-sampler eval (DDPM-1000, the evaluation/*.py default) ...
python -m cli.evaluate all --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --sampler ddpm \
  --num_inference_steps 1000 --out results/eval_r3b_ddpm.json
# ... and the DDIM-50 point for comparability with the r2/r3 tables
python -m cli.evaluate accuracy --run_dir ./tb_logs/$RUN \
  --dataset_dir "$DATA_DIR" --dataset_name "$EVAL_ZARR" --max_windows 60 \
  --out results/eval_r3b_ddim50.json

python -m cli.sample --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$TRAIN_ZARR" --model_name DDIM --num_inference_steps 10 \
  --out_dir results/r3b_samples

# trained-policy closed-loop demo with driving metrics (VERDICT item 3)
python bench.py --mode policy --envs 256 --run_dir ./tb_logs/$RUN \
  | tee results/bench_policy_r3b.json

echo "R3B DONE"
