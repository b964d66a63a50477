#!/bin/bash
# Round-5 directive-4: refresh the WHOLE BASELINE grid in one go so no
# round leaves "-" cells. Every row lands in results/r5/ as JSON.
# Idempotent ([ -f ] guards); safe to re-run after a partial cut.
set -e
cd "$(dirname "$0")"
mkdir -p results/r5
# persistent compile cache: per-invocation remote compiles cost 10-15 min
# through the axon tunnel otherwise (see RESULTS_r5.md)
export SPDM_BENCH_CACHE=/tmp/jax_bench_cache_r5
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache_r5

row () {  # outfile args...
  local out=$1; shift
  [ -f "results/r5/$out" ] || \
  timeout 900 python bench.py "$@" | tee "results/r5/$out"
}

# ---- env rows (1024 envs, 16-track bank — the historical config) -----------
row bench_env_only.json   --mode env_only   --envs 1024
row bench_env_render.json --mode env_render --envs 1024

# ---- closed-loop policy rows (trained ckpt: best driving model) ------------
POL=${SPDM_ENDGAME_POLICY:-tb_logs/r5blend}
row bench_policy_256_ddim10.json --mode policy --envs 256 --run_dir "$POL" --ema \
  --gaussian_init --ddim_spacing trailing --metrics-frames 0
row bench_policy_256_ddim5.json  --mode policy --envs 256 --run_dir "$POL" --ema \
  --gaussian_init --num_inference_steps 5 --ddim_spacing trailing --metrics-frames 0
row bench_policy_1024_m4_ddim10.json --mode policy --envs 1024 \
  --run_dir "$POL" --ema --gaussian_init --denoise_microbatches 4 \
  --ddim_spacing trailing --metrics-frames 0
# directive 8: DDIM-5 + microbatching combined at 1024 envs (never measured)
row bench_policy_1024_m4_ddim5.json --mode policy --envs 1024 \
  --run_dir "$POL" --ema --gaussian_init --denoise_microbatches 4 \
  --num_inference_steps 5 --ddim_spacing trailing --metrics-frames 0

# ---- MFU / train-step table ------------------------------------------------
[ -f results/r5/mfu_b16.json ] || \
timeout 900 python -m cli.mfu --train_batch 16 --out results/r5/mfu_b16.json
[ -f results/r5/mfu_b256_amp.json ] || \
timeout 900 python -m cli.mfu --train_batch 256 --amp \
  --out results/r5/mfu_b256_amp.json

echo "=== r5 endgame grid complete; results in results/r5/ ==="
