"""Rebuild a trainer_state resume sidecar for a params-only snapshot.

tools/snapshot_run.py deliberately drops optimizer state (inference
insurance, not resume), but after a host reset the snapshot may be all
that survives of a long run.  This tool makes such a snapshot resumable:
it reconstructs the param pytree directly from the snapshot npz's
flattened keystrs (no model build — a full U-Net init jit takes minutes
on a 1-CPU host), initializes FRESH optimizer moments (Adam bias
correction makes the warm-up transient a few hundred steps at the
resumed lr), and writes the trainer_state sidecar with the snapshot's
epoch so `--resume` continues from epoch+1.

Intended for cosine-schedule runs, where the resumed lr is recomputed
from the epoch index; for plateau runs pass --lr with the last known lr.

Usage:
  JAX_PLATFORMS=cpu python tools/make_resume_sidecar.py tb_logs/r3h
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def params_from_npz(npz_path: str):
    """Nested-dict pytree from a flat snapshot npz (keystr keys), fp32."""
    import numpy as np

    data = np.load(npz_path)
    params = {}
    for key in data.keys():
        parts = re.findall(r"\['([^']+)'\]", key)
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(data[key], dtype=np.float32)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="run dir containing checkpoints/epoch=K "
                                    "(npz snapshot) + hparams.yaml")
    ap.add_argument("--lr", type=float, default=None,
                    help="lr to resume at (plateau runs; cosine ignores it)")
    ap.add_argument("--best_val", type=float, default=None)
    args = ap.parse_args()

    import jax
    from state_policy_diffusionmodel_tpu import train
    from state_policy_diffusionmodel_tpu.train import checkpoints as C
    from state_policy_diffusionmodel_tpu.train.loop import make_optimizer

    hp = C.load_hparams(os.path.join(args.run_dir, "hparams.yaml"))
    tcfg = train.TrainConfig(**{
        k: hp[f"train_{k}"] for k in (
            "epochs", "batch_size", "lr", "grad_clip", "min_lr",
            "val_interval", "lr_schedule", "amp", "seed", "device_data",
            "early_stop") if f"train_{k}" in hp})

    latest = C.latest_checkpoint(args.run_dir)
    if latest is None:
        raise SystemExit(f"no checkpoints under {args.run_dir}")
    npz = os.path.join(latest, "params.npz")
    if not os.path.exists(npz):
        raise SystemExit(f"{latest} is not an npz snapshot — orbax "
                         "checkpoints already sit next to their sidecar")
    epoch = int(os.path.basename(latest).split("=")[1])

    params = params_from_npz(npz)
    opt_state = jax.device_get(make_optimizer(tcfg).init(params))

    meta = {"epoch": epoch,
            "lr": float(args.lr if args.lr is not None else tcfg.lr),
            "best_val": float(args.best_val if args.best_val is not None
                              else float("inf")),
            "num_bad": 0, "es_wait": 0}
    path = C.save_train_state(args.run_dir, opt_state, meta)
    print(f"wrote {path} (resume from epoch {epoch + 1}, "
          f"schedule={tcfg.lr_schedule})")


if __name__ == "__main__":
    main()
