"""Autoencoder pretraining CLI (parity with
/root/reference/encoder/train_autoencoder.py)."""

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
    args = p.parse_args()

    import numpy as np
    from state_policy_diffusionmodel_tpu.data.replay_buffer import load_zarr
    from state_policy_diffusionmodel_tpu.train.autoencoder import train_autoencoder

    buf = load_zarr(args.dataset)
    images = np.asarray(buf.data["img"], np.float32)
    if images.max() > 1.5:
        images = images / 255.0
    version = args.version or datetime.now().strftime("version_%Y%m%d_%H%M%S")
    out = os.path.join(args.out_dir, version)
    train_autoencoder(images, out, epochs=args.epochs,
                      batch_size=args.batch_size, lr=args.lr)
    print("checkpoints in", out)


if __name__ == "__main__":
    main()
