#!/usr/bin/env bash
# Round-3h: large-batch training done right — B=256 + cosine lr decay.
#
# run_r3g.sh answered why sqrt-scaled lr alone is not enough: the
# reference's ReduceLROnPlateau counts patience in EPOCHS, and a B=256
# epoch is only 282 optimizer steps (vs 4500 at B=16), so the lr floored
# by epoch 54 and val stalled at 0.0405 (r3e's B=16 run: 0.0345).  The
# schedule, not the batch size, was the binding constraint.
#
# r3h keeps B=256 / lr 4e-4 and swaps the val-driven plateau for a
# deterministic half-cosine to 1e-6 over 150 epochs (--lr_schedule cosine,
# TrainConfig.lr_schedule).  ~16 s/epoch measured -> ~40 min of training
# vs r3e's 97; the question is whether it reaches r3e's 0.0345 val and
# eval accuracy in that time.
#
# Reuses the r3 dataset and conv-AE from run_r3e.sh stages 1-2.
# Idempotent: every stage skips if its artifact exists; training resumes.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache

DATA_DIR=./data/r3
TRAIN_ZARR=r3_dataset_10_episodes_5_modes.zarr
EVAL_ZARR=r3_eval_dataset_1_episodes_1_modes.zarr
AE_DIR=./tb_logs_autoencoder/r3
RUN=r3h

mkdir -p results

test -f "$DATA_DIR/$TRAIN_ZARR/meta/episode_ends/.zarray" || {
  echo "missing r3 training dataset — run run_r3e.sh stage 1 first"; exit 1; }
test -d "$AE_DIR" || {
  echo "missing r3 autoencoder — run run_r3e.sh stage 2 first"; exit 1; }

# ---- stage 3: policy training (batch 256, cosine 4e-4 -> 1e-6, 150 epochs) --
python -m cli.train_policy --dataset_dir "$DATA_DIR" \
  --dataset_name "$TRAIN_ZARR" --n_epochs 150 --batch_size 256 --lr 4e-4 \
  --lr_schedule cosine --min_lr 1e-6 --device_data \
  --encoder_ckpt "$AE_DIR" --version $RUN --no_early_stop --resume
cp ./tb_logs/$RUN/metrics.jsonl results/train_metrics_r3h.jsonl

# ---- stage 4: evaluation battery --------------------------------------------
[ -f results/eval_r3h_ddpm.json ] || \
python -m cli.evaluate all --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --sampler ddpm \
  --num_inference_steps 1000 --out results/eval_r3h_ddpm.json
[ -f results/eval_r3h_gauss.json ] || \
python -m cli.evaluate all --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --gaussian_init \
  --out results/eval_r3h_gauss.json

# ---- stage 5: trained-policy closed-loop driving metrics --------------------
[ -f results/bench_policy_r3h_gauss.json ] || \
python bench.py --mode policy --envs 256 --run_dir ./tb_logs/$RUN \
  --gaussian_init | tee results/bench_policy_r3h_gauss.json

echo "R3H DONE"
