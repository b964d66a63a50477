#!/usr/bin/env bash
# Round-4 training studies (VERDICT r3 item 3): close the large-batch
# quality gap.
#
#   r4a  B=16 EQUAL-STEP CONTROL.  r3h (B=256, cosine, 150 epochs = 42k
#        optimizer steps) landed val 0.0355 / 4.87 u vs r3e's 0.0345 /
#        3.66 u at B=16 x ~675k steps.  Hypothesis on record: the
#        optimizer-step budget, not large-batch dynamics, explains the
#        gap.  Cheap converse test: B=16 under the same cosine shape
#        capped at ~42k steps (9 epochs x 4687 steps).  If it lands
#        ~0.0355 too, the budget explanation holds.
#   r4b  B=256 + EMA.  Same r3h recipe, 180 epochs (~50k steps, still
#        ~1/2 of r3e's wall time), --ema_decay 0.9995 (the standard
#        diffusion stabilizer the reference lacks; averaging horizon
#        ~2k steps), insurance snapshots on val improvement.  Eval both
#        raw and EMA weights; target <= 3.7 u overall.
#
# Reuses the r3 dataset + conv-AE.  Idempotent per stage.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
# no persistent compile cache: deserialized-executable stalls (bench.py)

DATA_DIR=./data/r3
TRAIN_ZARR=r3_dataset_10_episodes_5_modes.zarr
EVAL_ZARR=r3_eval_dataset_1_episodes_1_modes.zarr
AE_DIR=./tb_logs_autoencoder/r3

mkdir -p results

# ---- r4a: B=16 equal-step control ------------------------------------------
[ -f results/eval_r4a_gauss.json ] || {
python -m cli.train_policy --dataset_dir "$DATA_DIR" \
  --dataset_name "$TRAIN_ZARR" --n_epochs 9 --batch_size 16 --lr 1e-4 \
  --lr_schedule cosine --min_lr 1e-6 --device_data \
  --encoder_ckpt "$AE_DIR" --version r4a --no_early_stop --resume
cp ./tb_logs/r4a/metrics.jsonl results/train_metrics_r4a.jsonl
python -m cli.evaluate all --run_dir ./tb_logs/r4a --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --gaussian_init \
  --out results/eval_r4a_gauss.json
}

# ---- r4b: B=256 cosine + EMA ------------------------------------------------
python -m cli.train_policy --dataset_dir "$DATA_DIR" \
  --dataset_name "$TRAIN_ZARR" --n_epochs 180 --batch_size 256 --lr 4e-4 \
  --lr_schedule cosine --min_lr 1e-6 --device_data \
  --ema_decay 0.9995 --insurance_dir artifacts/r4b_best \
  --encoder_ckpt "$AE_DIR" --version r4b --no_early_stop --resume
cp ./tb_logs/r4b/metrics.jsonl results/train_metrics_r4b.jsonl

[ -f results/eval_r4b_gauss.json ] || \
python -m cli.evaluate all --run_dir ./tb_logs/r4b --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --gaussian_init \
  --out results/eval_r4b_gauss.json
[ -f results/eval_r4b_ema_gauss.json ] || \
python -m cli.evaluate all --run_dir ./tb_logs/r4b --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --gaussian_init --ema \
  --out results/eval_r4b_ema_gauss.json

[ -f results/bench_policy_r4b_ema_gauss.json ] || \
python bench.py --mode policy --envs 256 --run_dir ./tb_logs/r4b \
  --gaussian_init --ema | tee results/bench_policy_r4b_ema_gauss.json

echo "R4 TRAIN STUDIES DONE"
