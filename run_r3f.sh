#!/usr/bin/env bash
# Round-3f: the capacity push — same reference recipe as run_r3e.sh but a
# width-128 denoiser (--model_width 128; 2x the reference channel plan,
# ~4x FLOPs/params).
#
# Why: the r3e width-64 run converged with train loss 0.0347 ~= val loss
# 0.0345 (results/train_metrics_r3e.jsonl) — no overfit gap at all, i.e.
# the model is capacity-limited on the 100k-frame dataset, not
# data-limited.  The model_width knob (PolicyConfig.model_width) exists
# for exactly this experiment; hparams.yaml round-trips it so every
# downstream CLI (evaluate/sample/run_predictions/bench --run_dir)
# rebuilds the wide net automatically.
#
# Reuses the r3 dataset (100k frames, 5 lane modes) and the r3 conv-AE
# (the vision encoder is independent of denoiser width).
#
# Idempotent: every stage skips if its artifact exists; training resumes.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache

DATA_DIR=./data/r3
TRAIN_ZARR=r3_dataset_10_episodes_5_modes.zarr
EVAL_ZARR=r3_eval_dataset_1_episodes_1_modes.zarr
AE_DIR=./tb_logs_autoencoder/r3
RUN=r3f

mkdir -p results

test -f "$DATA_DIR/$TRAIN_ZARR/meta/episode_ends/.zarray" || {
  echo "missing r3 training dataset — run run_r3e.sh stage 1 first"; exit 1; }
test -d "$AE_DIR" || {
  echo "missing r3 autoencoder — run run_r3e.sh stage 2 first"; exit 1; }

# ---- stage 3: policy training (width 128, 200 epochs, lr floor 1e-6) --------
# Epoch budget cut 200 -> 125: lr floored at 1e-6 by epoch 75 and val was
# flat at ~0.0348-0.0353 from epoch 80 through 120 (best 0.03474 @ 107), so
# the remaining epochs could not move the model.
python -m cli.train_policy --dataset_dir "$DATA_DIR" \
  --dataset_name "$TRAIN_ZARR" --n_epochs 125 --batch_size 16 \
  --model_width 128 \
  --device_data --encoder_ckpt "$AE_DIR" --version $RUN \
  --no_early_stop --min_lr 1e-6 --resume
cp ./tb_logs/$RUN/metrics.jsonl results/train_metrics_r3f.jsonl

# ---- stage 4: evaluation battery --------------------------------------------
# reference-parity sampler (evaluation/*.py sample with full DDPM-1000)
[ -f results/eval_r3f_ddpm.json ] || \
python -m cli.evaluate all --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --sampler ddpm \
  --num_inference_steps 1000 --out results/eval_r3f_ddpm.json
# framework's best config: DDIM-50 + N(0,1) init
[ -f results/eval_r3f_gauss.json ] || \
python -m cli.evaluate all --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --gaussian_init \
  --out results/eval_r3f_gauss.json

# ---- stage 5: trained-policy closed-loop driving metrics --------------------
[ -f results/bench_policy_r3f_gauss.json ] || \
python bench.py --mode policy --envs 256 --run_dir ./tb_logs/$RUN \
  --gaussian_init | tee results/bench_policy_r3f_gauss.json

echo "R3F DONE"
