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
        v = np.asarray(data[key])
        # fp16 insurance snapshots upcast; non-floating leaves pass through
        # unchanged (mirrors snapshot_run.py's cast())
        if np.issubdtype(v.dtype, np.floating):
            v = v.astype(np.float32)
        node[parts[-1]] = v
    # The keystr regex only understands dict keys; a list/tuple/attr node
    # would produce segments ([0], .attr) it silently drops, collapsing
    # distinct leaves.  Verify the rebuilt tree round-trips to the exact
    # npz key set so that failure mode is loud, not a corrupt template.
    import jax
    rebuilt = {jax.tree_util.keystr(kp)
               for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    if rebuilt != set(data.keys()):
        raise SystemExit(
            "snapshot keystrs contain non-dict pytree nodes the rebuilder "
            f"cannot represent: {sorted(set(data.keys()) - rebuilt)[:5]} ...")
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="run dir containing checkpoints/epoch=K "
                                    "(npz snapshot) + hparams.yaml")
    ap.add_argument("--lr", type=float, default=None,
                    help="lr to resume at (plateau runs; cosine ignores it)")
    ap.add_argument("--best_val", type=float, default=None)
    ap.add_argument("--force", action="store_true",
                    help="overwrite an existing trainer_state sidecar (it may "
                         "hold REAL optimizer moments from the original run)")
    ap.add_argument("--initial_lr_ok", action="store_true",
                    help="plateau runs: explicitly accept resuming at the "
                         "undecayed initial lr when --lr is omitted")
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

    if tcfg.lr_schedule != "cosine" and args.lr is None \
            and not args.initial_lr_ok:
        raise SystemExit(
            f"run uses lr_schedule={tcfg.lr_schedule!r}: resuming without "
            f"--lr would silently restart at the undecayed initial lr "
            f"({tcfg.lr}) with reset plateau/early-stop state.  Pass --lr "
            "<last known lr> (see the run's metrics jsonl) or "
            "--initial_lr_ok to accept the initial lr.")
    existing = os.path.join(args.run_dir, "trainer_state", "meta.yaml")
    if os.path.exists(existing) and not args.force:
        raise SystemExit(
            f"{existing} already exists — it may hold real optimizer "
            "moments from the original run (npz-fallback training writes "
            "both).  Pass --force to overwrite with fresh moments.")

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
