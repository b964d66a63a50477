"""Autoencoder pretraining + reconstruction-eval CLI (parity with
/root/reference/encoder/train_autoencoder.py and eval_autoencoder.py)."""

from __future__ import annotations

import argparse
import os
from datetime import datetime


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, help="zarr dataset path")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--out_dir", default="./tb_logs_autoencoder")
    p.add_argument("--version", default=None)
    p.add_argument("--eval_run", default=None,
                   help="instead of training, write a reconstruction grid "
                        "for this trained run dir (eval_autoencoder.py parity)")
    p.add_argument("--n_eval", type=int, default=8)
    args = p.parse_args()

    import numpy as np
    from state_policy_diffusionmodel_tpu.data.replay_buffer import load_zarr
    from state_policy_diffusionmodel_tpu.train.autoencoder import train_autoencoder

    buf = load_zarr(args.dataset)
    images = np.asarray(buf.data["img"], np.float32)
    if images.max() > 1.5:
        images = images / 255.0

    if args.eval_run:
        import jax
        import jax.numpy as jnp
        from state_policy_diffusionmodel_tpu.models import Autoencoder
        from state_policy_diffusionmodel_tpu.train import checkpoints
        from state_policy_diffusionmodel_tpu.utils import plotting

        ae = Autoencoder()
        tmpl = jax.device_get(
            jax.jit(ae.init)(jax.random.key(0),
                             jnp.zeros((1, 96, 96, 3)))["params"])
        params = checkpoints.load_checkpoint(
            checkpoints.latest_checkpoint(args.eval_run), tmpl)
        idx = np.linspace(0, len(images) - 1, args.n_eval).astype(int)
        batch = jnp.asarray(images[idx])
        recon = np.asarray(ae.apply({"params": params}, batch))
        mse = float(np.mean((recon - images[idx]) ** 2))
        out = os.path.join(args.eval_run, "reconstructions.png")
        plotting.image_grid(
            np.concatenate([images[idx], recon]), out, ncols=args.n_eval)
        print(f"reconstruction MSE {mse:.6f}; grid written to {out}")
        return

    version = args.version or datetime.now().strftime("version_%Y%m%d_%H%M%S")
    out = os.path.join(args.out_dir, version)
    train_autoencoder(images, out, epochs=args.epochs,
                      batch_size=args.batch_size, lr=args.lr)
    print("checkpoints in", out)


if __name__ == "__main__":
    main()
