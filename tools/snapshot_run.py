"""Snapshot a training run's latest checkpoint into a git-committable dir.

The axon host destroys gitignored artifacts on reset (round 3 lost the
r3e and r3f checkpoints this way); this tool exports the parts needed to
*evaluate* a trained policy — latest params as a compressed flat npz,
plus the hparams.yaml / STATS.pkl sidecars — into a small directory that
works as a drop-in `--run_dir` for every CLI (train/checkpoints.py's
npz restore path reads it).  Optimizer state is deliberately dropped:
snapshots are for inference insurance, not resume.

--dtype float16 halves the size; weight round-trip error ~1e-4 relative,
on par with the bf16 the closed-loop bench already runs the denoiser in.
Snapshots record their dtype in the filename-visible npz arrays only —
downstream loaders cast back to the template's dtype (fp32) on restore.

Usage:
  JAX_PLATFORMS=cpu python tools/snapshot_run.py tb_logs/r3h artifacts/r3h
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--dtype", default=None,
                    help="downcast floating params (e.g. float16)")
    args = ap.parse_args()

    import jax
    import numpy as np
    from state_policy_diffusionmodel_tpu.train import checkpoints as C

    src = C.latest_checkpoint(args.run_dir)
    if src is None:
        raise SystemExit(f"no checkpoints under {args.run_dir}")
    epoch = os.path.basename(src)
    params = C.load_checkpoint(src)  # orbax restores without a template
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    dst = os.path.join(args.out_dir, "checkpoints", epoch)
    os.makedirs(dst, exist_ok=True)

    def cast(v):
        v = np.asarray(v)
        if args.dtype and np.issubdtype(v.dtype, np.floating):
            v = v.astype(args.dtype)
        return v

    np.savez_compressed(
        os.path.join(dst, "params.npz"),
        **{jax.tree_util.keystr(k): cast(v) for k, v in flat})
    for side in ("hparams.yaml", "STATS.pkl"):
        p = os.path.join(args.run_dir, side)
        if os.path.exists(p):
            shutil.copy2(p, os.path.join(args.out_dir, side))
    nbytes = os.path.getsize(os.path.join(dst, "params.npz"))
    print(f"snapshot: {args.out_dir} ({epoch}, params.npz "
          f"{nbytes / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
