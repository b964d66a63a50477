#!/usr/bin/env bash
# Round-3e: the reference-scale quality run with the lr floor.
#
# History: run_r3.sh trained under the reference recipe and early-stopped
# (monitor='lr') at epoch 50 with val_loss still descending; run_r3b.sh
# resumed with --no_early_stop, but without the early stop nothing halts
# ReduceLROnPlateau's decay (torch default min_lr=0) — lr reached 1e-20
# and the model froze ~epoch 100 at val 0.0368.  TrainConfig.min_lr now
# plumbs torch's min_lr; this run is the reference recipe
# (/root/reference/train.py:16) with --no_early_stop --min_lr 1e-6 so the
# plateau scheduler anneals to a floor instead of to zero.
#
# Epoch budget: the reference default is 500 epochs, but this run converged
# long before that — ReduceLROnPlateau floored the lr at 1e-6 by epoch 89
# and val_loss has been flat at 0.0345–0.0353 from epoch ~110 through 184
# (best 0.03450 @ epoch ~167; see results/train_metrics_r3e.jsonl).  The
# reference's own EarlyStopping(monitor='lr') would have halted here too,
# so the recipe is cut to 200 epochs rather than spending 4+ TPU-hours at
# a dead learning rate.
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
RUN=r3e

mkdir -p results

# ---- stage 1: training dataset (100k frames, same seeds as run_r3.sh) ------
if [ ! -f "$DATA_DIR/$TRAIN_ZARR/meta/episode_ends/.zarray" ]; then
  python - <<'EOF'
from state_policy_diffusionmodel_tpu.data import generate_dataset
generate_dataset(
    "./data/r3/r3_dataset_10_episodes_5_modes.zarr",
    episodes_per_mode=10,
    modes=("left", "right", "middle", "lleft", "rright"),
    driver="lane_follow", n_steps=2000, seed0=43, progress=True)
EOF
fi

# ---- stage 1b: held-out eval dataset ----------------------------------------
if [ ! -f "$DATA_DIR/$EVAL_ZARR/meta/episode_ends/.zarray" ]; then
  python - <<'EOF'
from state_policy_diffusionmodel_tpu.data import generate_dataset
generate_dataset(
    "./data/r3/r3_eval_dataset_1_episodes_1_modes.zarr",
    episodes_per_mode=1, modes=("left",),
    driver="lane_follow", n_steps=2000, seed0=42, progress=True)
EOF
fi

# ---- stage 2: autoencoder pretraining ---------------------------------------
if [ ! -d "$AE_DIR" ]; then
  python -m cli.train_autoencoder --dataset "$DATA_DIR/$TRAIN_ZARR" \
    --epochs 20 --batch_size 128 --version r3
fi

# ---- stage 3: policy training (200 epochs, lr floor 1e-6) -------------------
python -m cli.train_policy --dataset_dir "$DATA_DIR" \
  --dataset_name "$TRAIN_ZARR" --n_epochs 200 --batch_size 16 \
  --device_data --encoder_ckpt "$AE_DIR" --version $RUN \
  --no_early_stop --min_lr 1e-6 --resume
cp ./tb_logs/$RUN/metrics.jsonl results/train_metrics_r3e.jsonl

# ---- stage 4: evaluation battery --------------------------------------------
# reference-parity sampler (evaluation/*.py sample with full DDPM-1000)
[ -f results/eval_r3e_ddpm.json ] || \
python -m cli.evaluate all --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --sampler ddpm \
  --num_inference_steps 1000 --out results/eval_r3e_ddpm.json
# framework's best config: DDIM-50 + N(0,1) init
[ -f results/eval_r3e_gauss.json ] || \
python -m cli.evaluate all --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --gaussian_init \
  --out results/eval_r3e_gauss.json

# ---- stage 5: trained-policy closed-loop driving metrics --------------------
[ -f results/bench_policy_r3e_gauss.json ] || \
python bench.py --mode policy --envs 256 --run_dir ./tb_logs/$RUN \
  --gaussian_init | tee results/bench_policy_r3e_gauss.json

# ---- stage 6: denoise animations + live overlay demo ------------------------
[ -d results/r3e_samples ] || \
python -m cli.sample --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$TRAIN_ZARR" --model_name DDIM --num_inference_steps 10 \
  --out_dir results/r3e_samples
[ -f results/r3e_overlay.mp4 ] || [ -f results/r3e_overlay.gif ] || \
python -m cli.run_predictions --run_dir ./tb_logs/$RUN --gaussian_init \
  --out results/r3e_overlay.mp4 || true

echo "R3E DONE"
