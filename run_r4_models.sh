#!/usr/bin/env bash
# Round-4 model-family studies (VERDICT r3 items 5 & 6):
#
#   r4sin  The reference's SECOND data recipe at scale
#          (/root/reference/generateData/generateSinusoidalTraj.py:41-198):
#          a mixed dataset of PID center-follow + sinusoidal safe (A=5) +
#          sinusoidal unsafe (A=13) episodes, 45 episodes x 2000 steps =
#          90k frames, then the B=256 cosine+EMA policy recipe on it and
#          the eval battery on a held-out center-follow episode.
#   r4rn   A TRAINED ResNet18-GN vision-encoder policy (closing the one
#          'partial' inventory row): same r3 dataset as the conv-AE
#          baseline, --vision_encoder resnet18 --train_encoder (random
#          frozen features carry no signal; the reference's finetune
#          attempt is encoder/finetune_resnet.py:68), B=256 cosine+EMA.
#
# Idempotent per stage.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site

DATA_DIR=./data/r4
SIN_ZARR=r4_sin_dataset_45_episodes_3_drivers.zarr
SIN_EVAL_ZARR=r4_sin_eval_dataset_1_episodes.zarr
R3_DATA_DIR=./data/r3
R3_TRAIN_ZARR=r3_dataset_10_episodes_5_modes.zarr
R3_EVAL_ZARR=r3_eval_dataset_1_episodes_1_modes.zarr
AE_DIR=./tb_logs_autoencoder/r3

mkdir -p results "$DATA_DIR"

# ---- stage 1: mixed sinusoidal/PID dataset ---------------------------------
if [ ! -f "$DATA_DIR/$SIN_ZARR/meta/episode_ends/.zarray" ]; then
  python - <<'EOF'
import numpy as np
from state_policy_diffusionmodel_tpu.data.collect import collect_episodes
from state_policy_diffusionmodel_tpu.data.replay_buffer import ReplayBuffer

buf = ReplayBuffer.create_empty_numpy()
seeds_all = []
recipes = [  # (driver, kwargs, seed0) — 15 episodes each, 2000 steps
    ("center_follow", {}, 300),
    ("sinusoidal", {"amplitude": 5.0}, 320),
    ("sinusoidal", {"amplitude": 13.0}, 340),
]
for driver, kw, seed0 in recipes:
    seeds = list(range(seed0, seed0 + 15))
    seeds_all.extend(seeds)
    for ep in collect_episodes(seeds, driver=driver, n_steps=2000,
                               progress=True, **kw):
        # uniform schema across drivers: the reference's sinusoidal recipe
        # stores a "human action" channel for the PID episodes too
        # (generateSinusoidalTraj.py:101,177)
        ep.setdefault("h_action", ep["action"].copy())
        buf.add_episode(ep)
    print(f"collected 15 x 2000 {driver} {kw}")
buf.meta["track_seed"] = np.asarray(seeds_all, np.int64)
buf.save_to_path("./data/r4/r4_sin_dataset_45_episodes_3_drivers.zarr")
EOF
fi

# ---- stage 1b: held-out center-follow eval episode -------------------------
if [ ! -f "$DATA_DIR/$SIN_EVAL_ZARR/meta/episode_ends/.zarray" ]; then
  python - <<'EOF'
import numpy as np
from state_policy_diffusionmodel_tpu.data.collect import collect_episodes
from state_policy_diffusionmodel_tpu.data.replay_buffer import ReplayBuffer

buf = ReplayBuffer.create_empty_numpy()
for ep in collect_episodes([42], driver="center_follow", n_steps=2000,
                           progress=True):
    buf.add_episode(ep)
buf.meta["track_seed"] = np.asarray([42], np.int64)
buf.save_to_path("./data/r4/r4_sin_eval_dataset_1_episodes.zarr")
EOF
fi

# ---- stage 2: r4sin policy (B=256 cosine + EMA on the mixed data) ----------
[ -f results/eval_r4sin_ema_gauss.json ] || {
python -m cli.train_policy --dataset_dir "$DATA_DIR" \
  --dataset_name "$SIN_ZARR" --n_epochs 120 --batch_size 256 --lr 4e-4 \
  --lr_schedule cosine --min_lr 1e-6 --device_data \
  --ema_decay 0.9995 --insurance_dir artifacts/r4sin_best \
  --encoder_ckpt "$AE_DIR" --version r4sin --no_early_stop --resume
cp ./tb_logs/r4sin/metrics.jsonl results/train_metrics_r4sin.jsonl
python -m cli.evaluate all --run_dir ./tb_logs/r4sin \
  --dataset_dir "$DATA_DIR" --dataset_name "$SIN_EVAL_ZARR" \
  --max_windows 60 --gaussian_init --ema \
  --out results/eval_r4sin_ema_gauss.json
}
[ -f results/bench_policy_r4sin_ema_gauss.json ] || \
python bench.py --mode policy --envs 256 --run_dir ./tb_logs/r4sin \
  --gaussian_init --ema | tee results/bench_policy_r4sin_ema_gauss.json

# ---- stage 2b: quick measurements before the long ResNet run ---------------
# (idempotent; the chained run_r4_dpmpp_fix.sh re-invocation no-ops)
bash ./run_r4_dpmpp_fix.sh || true

# ---- stage 3: r4rn ResNet18-GN policy on the r3 dataset --------------------
[ -f results/eval_r4rn_ema_gauss.json ] || {
python -m cli.train_policy --dataset_dir "$R3_DATA_DIR" \
  --dataset_name "$R3_TRAIN_ZARR" --n_epochs 90 --batch_size 256 \
  --lr 4e-4 --lr_schedule cosine --min_lr 1e-6 --device_data \
  --vision_encoder resnet18 --train_encoder \
  --ema_decay 0.9995 --insurance_dir artifacts/r4rn_best \
  --version r4rn --no_early_stop --resume
cp ./tb_logs/r4rn/metrics.jsonl results/train_metrics_r4rn.jsonl
python -m cli.evaluate all --run_dir ./tb_logs/r4rn \
  --dataset_dir "$R3_DATA_DIR" --dataset_name "$R3_EVAL_ZARR" \
  --max_windows 60 --gaussian_init --ema \
  --out results/eval_r4rn_ema_gauss.json
}
[ -f results/bench_policy_r4rn_ema_gauss.json ] || \
python bench.py --mode policy --envs 256 --run_dir ./tb_logs/r4rn \
  --gaussian_init --ema | tee results/bench_policy_r4rn_ema_gauss.json

echo "R4 MODEL STUDIES DONE"
