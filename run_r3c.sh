#!/usr/bin/env bash
# Round-3c: post-training measurement battery.  Run AFTER run_r3b.sh
# prints "R3B DONE" (it owns the chip until then).  Each stage skips if
# its artifact already exists — safe to re-run after interruptions.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache

DATA_DIR=./data/r3
EVAL_ZARR=r3_eval_dataset_1_episodes_1_modes.zarr
RUN=./tb_logs/r3

# 1. quality-configuration eval: DDIM-50 + N(0,1) init (the framework's
#    best sampler config; the reference-parity DDPM/uniform numbers come
#    from run_r3b.sh)
[ -f results/eval_r3b_gauss.json ] || \
python -m cli.evaluate all --run_dir $RUN --dataset_dir "$DATA_DIR" \
  --dataset_name "$EVAL_ZARR" --max_windows 60 --gaussian_init \
  --out results/eval_r3b_gauss.json

# 2. trained-policy closed-loop driving metrics with the good sampler
[ -f results/bench_policy_r3b_gauss.json ] || \
python bench.py --mode policy --envs 256 --run_dir $RUN --gaussian_init \
  | tee results/bench_policy_r3b_gauss.json

# 3. env+render headline at 1024 envs (post score-label trim)
[ -f results/bench_env_render_r3.json ] || \
python bench.py --mode env_render --envs 1024 \
  | tee results/bench_env_render_r3.json

# 4. MFU table (VERDICT item 5)
[ -f results/mfu_r3.json ] || \
python -m cli.mfu --out results/mfu_r3.json

# 5. 1024-env policy point: microbatch A/B
[ -f results/bench_policy_1024_m1.json ] || \
python bench.py --mode policy --envs 1024 --repeats 2 \
  | tee results/bench_policy_1024_m1.json
[ -f results/bench_policy_1024_m2.json ] || \
python bench.py --mode policy --envs 1024 --repeats 2 \
  --denoise_microbatches 2 | tee results/bench_policy_1024_m2.json
[ -f results/bench_policy_1024_m4.json ] || \
python bench.py --mode policy --envs 1024 --repeats 2 \
  --denoise_microbatches 4 | tee results/bench_policy_1024_m4.json

# 6. prediction-overlay demo video with the trained model
[ -f results/r3_overlay.mp4 ] || \
python -m cli.run_predictions --run_dir $RUN --gaussian_init \
  --out results/r3_overlay.mp4 || true

echo "R3C DONE"
