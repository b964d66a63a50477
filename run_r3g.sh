#!/usr/bin/env bash
# Round-3g: the TPU-shaped training recipe — large-batch data parallelism
# on one chip instead of the reference's latency-bound B=16.
#
# Why: cli.mfu measured the reference recipe (batch 16, lr 1e-4,
# /root/reference/train.py:16-19) at 3.4% MFU on a v5e — the train step is
# dispatch-latency-bound, not compute-bound, at that batch.  B=256 runs the
# same step at 11% MFU / 3.7x the per-sample throughput.  r3g trains the
# identical model/data/loss with batch 256 and sqrt-scaled lr
# (1e-4 * sqrt(256/16) = 4e-4), plateau floor 1e-6, and asks one question:
# does it reach r3e's converged val (0.0345) in a fraction of the wall
# time?  (r3e: ~29 s/epoch x 200 epochs ~= 97 min on the 100k-frame set.)
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
RUN=r3g

mkdir -p results

test -f "$DATA_DIR/$TRAIN_ZARR/meta/episode_ends/.zarray" || {
  echo "missing r3 training dataset — run run_r3e.sh stage 1 first"; exit 1; }
test -d "$AE_DIR" || {
  echo "missing r3 autoencoder — run run_r3e.sh stage 2 first"; exit 1; }

# ---- stage 3: policy training (batch 256, lr 4e-4) --------------------------
# Budget cut 300 -> 70 epochs, observed live: the plateau scheduler's
# patience counts EPOCHS, and at B=256 an epoch is only 282 optimizer steps
# (vs 4500 at B=16) — lr stepped 4e-4 -> 4e-5 at epoch 32, floored at 1e-6
# by epoch 54, val flat at ~0.041 since (best 0.0405 @ ~56; r3e's B=16
# run reached 0.0345). Answer to the r3g question: sqrt-scaled lr under an
# epoch-patience plateau schedule does NOT reach B=16 quality — the
# schedule, not the batch size, is the binding constraint; see run_r3h.sh
# (cosine decay) for the large-batch recipe done right.
python -m cli.train_policy --dataset_dir "$DATA_DIR" \
  --dataset_name "$TRAIN_ZARR" --n_epochs 70 --batch_size 256 --lr 4e-4 \
  --device_data --encoder_ckpt "$AE_DIR" --version $RUN \
  --no_early_stop --min_lr 1e-6 --resume
cp ./tb_logs/$RUN/metrics.jsonl results/train_metrics_r3g.jsonl

# ---- stage 4: evaluation battery --------------------------------------------
[ -f results/eval_r3g_ddpm.json ] || \
python -m cli.evaluate all --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --sampler ddpm \
  --num_inference_steps 1000 --out results/eval_r3g_ddpm.json
[ -f results/eval_r3g_gauss.json ] || \
python -m cli.evaluate all --run_dir ./tb_logs/$RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --gaussian_init \
  --out results/eval_r3g_gauss.json

# ---- stage 5: trained-policy closed-loop driving + sampler-cost curve -------
for N in 5 10 20 50; do
  [ -f results/bench_policy_r3g_ddim$N.json ] || \
  python bench.py --mode policy --envs 256 --run_dir ./tb_logs/$RUN \
    --gaussian_init --num_inference_steps $N \
    | tee results/bench_policy_r3g_ddim$N.json
done

echo "R3G DONE"
