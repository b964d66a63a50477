"""Dataset inspection CLI (parity with
/root/reference/scripts/visualize_{position,images,actions}.py, including
the normalized-window sanity plots of visualize_position.py:150-264)."""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", help="zarr dataset path (dir or .zip)")
    p.add_argument("--what", default="positions",
                   choices=["positions", "actions", "images", "normalized"])
    p.add_argument("--episode", type=int, default=0)
    p.add_argument("--n_windows", type=int, default=4,
                   help="windows sampled for --what normalized")
    p.add_argument("--window_len", type=int, default=100,
                   help="window length for --what normalized "
                        "(visualize_position.py:150 sequence_length)")
    p.add_argument("--seed", type=int, default=0)
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
    elif args.what == "normalized":
        # per-window normalization sanity (visualize_position.py:150-264):
        # raw window | min-max normalized | centered at the first frame,
        # plus the mean per-window min/max (the averaged-stats quirk inputs,
        # load_data.py:58-78)
        from state_policy_diffusionmodel_tpu.data import normalize as N

        pos_all = np.asarray(buf.data["position"], np.float32)
        ends = np.asarray(buf.episode_ends, np.int64)
        idx = N.create_sample_indices_sparse(ends, args.window_len, 1)
        rng = np.random.default_rng(args.seed)
        picks = rng.permutation(len(idx))[:args.n_windows]
        n = len(picks)
        fig, axes = plt.subplots(n, 3, figsize=(12, 3 * n), squeeze=False)
        mins, maxs = [], []
        for row, w in enumerate(picks):
            start, end, _, _ = idx[w]
            sample = pos_all[start:end]
            stats = N.get_data_stats(sample)
            mins.append(float(np.min(stats["min"])))
            maxs.append(float(np.max(stats["max"])))
            normed = N.normalize_data(sample, stats)
            centered = normed - normed[0]
            for ax, arr, title in zip(
                    axes[row],
                    (sample, normed, centered),
                    ("raw", "normalized", "centered")):
                ax.plot(arr[:, 0], arr[:, 1])
                ax.set_title(f"window {w}: {title}")
                ax.grid(True)
            axes[row][2].scatter([0], [0], c="r")
        print(f"mean per-window min {np.mean(mins):.3f} "
              f"max {np.mean(maxs):.3f} over {n} windows")
        fig.tight_layout()
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
