"""Dataset inspection CLI (parity with
/root/reference/scripts/visualize_{position,images,actions}.py)."""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", help="zarr dataset path (dir or .zip)")
    p.add_argument("--what", default="positions",
                   choices=["positions", "actions", "images"])
    p.add_argument("--episode", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import numpy as np
    from state_policy_diffusionmodel_tpu.data.replay_buffer import load_zarr
    from state_policy_diffusionmodel_tpu.utils.plotting import _plt, fig_to_array
    from PIL import Image

    buf = load_zarr(args.dataset)
    ep = buf.get_episode(args.episode)
    plt = _plt()
    out = args.out or f"dataset_{args.what}_ep{args.episode}.png"

    if args.what == "positions":
        fig = plt.figure(figsize=(7, 7))
        pos = ep["position"]
        plt.plot(pos[:, 0], pos[:, 1], ".-", ms=2)
        plt.axis("equal"); plt.grid(); plt.title("episode positions")
    elif args.what == "actions":
        fig, axes = plt.subplots(3, 1, figsize=(10, 7), sharex=True)
        for i, name in enumerate(["steer", "gas", "brake"]):
            axes[i].plot(ep["action"][:, i]); axes[i].set_ylabel(name)
        axes[-1].set_xlabel("step")
    else:
        imgs = ep["img"]
        idxs = np.linspace(0, len(imgs) - 1, 16).astype(int)
        fig, axes = plt.subplots(4, 4, figsize=(10, 10))
        for ax, i in zip(axes.flat, idxs):
            frame = imgs[i]
            if frame.max() <= 1.5:
                frame = (frame * 255).astype(np.uint8)
            ax.imshow(frame); ax.set_title(str(i)); ax.axis("off")

    Image.fromarray(fig_to_array(fig)).save(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
