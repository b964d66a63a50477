"""Merge two or more episodic zarr datasets into one training zarr.

Round-5 blend experiment: the r3 lane-follow dataset (100k frames, 5 lane
modes) teaches lane discipline; the r4 sinusoidal/PID mix (90k frames)
teaches speed + regularizes. Neither recipe alone produces both open-loop
accuracy AND fast on-road driving (results/RESULTS_r5.md); this merges
them so one model trains on the union. Keys are intersected (h_action /
car_state sidecars drop out if any source lacks them); meta/track_seed
concatenates so per-episode replays keep working.

Usage:
  python tools/merge_datasets.py OUT.zarr IN1.zarr IN2.zarr [...]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from state_policy_diffusionmodel_tpu.data.replay_buffer import (  # noqa: E402
    ReplayBuffer, load_zarr)


def main():
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    out_path, srcs = sys.argv[1], sys.argv[2:]
    buffers = [load_zarr(p) for p in srcs]
    keys = set(buffers[0].data.keys())
    for b in buffers[1:]:
        keys &= set(b.data.keys())
    print("common keys:", sorted(keys))

    merged = ReplayBuffer.create_empty_numpy()
    seeds = []
    for p, b in zip(srcs, buffers):
        src_seeds = b.meta.get("track_seed")
        for i in range(b.n_episodes):
            ep = {k: np.asarray(v) for k, v in b.get_episode(i).items()
                  if k in keys}
            merged.add_episode(ep)
            seeds.append(int(src_seeds[i]) if src_seeds is not None else -1)
        print(f"  {p}: +{b.n_episodes} episodes")
    merged.meta["track_seed"] = np.asarray(seeds, np.int64)
    merged.save_to_path(out_path)
    print(f"saved {merged.n_episodes} episodes / {merged.n_steps} steps "
          f"to {out_path}")


if __name__ == "__main__":
    main()
