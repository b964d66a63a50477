#!/usr/bin/env bash
# Round-3 reference-scale pipeline (VERDICT.md next-round item 2).
#
# Mirrors the reference's five-stage recipe at its intended scale:
#   data gen 5 lane modes x 10 episodes x 2000 steps = 100k frames
#   (generateParallelTraj.py defaults: 2000 steps/episode),
#   AE pretraining, then policy training to the reference's 500-epoch /
#   lr-early-stop recipe (train.py:16, train.py:95) with device-resident data.
set -euo pipefail
cd "$(dirname "$0")"

STAMP=r3
DATA_DIR=./data/$STAMP
TRAIN_ZARR=r3_dataset_10_episodes_5_modes.zarr
EVAL_ZARR=r3_eval_dataset_1_episodes_1_modes.zarr
AE_DIR=./tb_logs_autoencoder/$STAMP
RUN=r3

mkdir -p results

# ---- stage 1: training dataset (100k frames) ------------------------------
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

# ---- stage 1b: held-out eval dataset (reference
# evaluation/trajectory_data_generation.py: one left-lane 2000-step episode) -
if [ ! -f "$DATA_DIR/$EVAL_ZARR/meta/episode_ends/.zarray" ]; then
  python - <<'EOF'
from state_policy_diffusionmodel_tpu.data import generate_dataset
generate_dataset(
    "./data/r3/r3_eval_dataset_1_episodes_1_modes.zarr",
    episodes_per_mode=1, modes=("left",),
    driver="lane_follow", n_steps=2000, seed0=42, progress=True)
EOF
fi

# ---- stage 2: autoencoder pretraining --------------------------------------
if [ ! -d "$AE_DIR" ]; then
  python -m cli.train_autoencoder --dataset "$DATA_DIR/$TRAIN_ZARR" \
    --epochs 20 --batch_size 128 --version $STAMP
fi

# ---- stage 3: policy training (reference recipe, fixed lr cadence) ---------
if [ ! -d "./tb_logs/$RUN" ]; then
  python -m cli.train_policy --dataset_dir "$DATA_DIR" \
    --dataset_name "$TRAIN_ZARR" --n_epochs 500 --batch_size 16 \
    --device_data --encoder_ckpt "$AE_DIR" --version $RUN
fi
cp ./tb_logs/$RUN/metrics.jsonl results/train_metrics_r3.jsonl

# ---- stage 4: sampling + denoise animations ---------------------------------
python -m cli.sample --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$TRAIN_ZARR" --model_name DDIM --num_inference_steps 10 \
  --out_dir results/r3_samples

# ---- stage 5: evaluation suite ----------------------------------------------
python -m cli.evaluate all --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --out results/eval_r3.json

echo "PIPELINE DONE"
