"""Build the SHARED benchmark eval set (round-5 directive 5).

One fixed, committed episode set on which EVERY recipe's open-loop accuracy
is measured apples-to-apples (the round-4 2.44 u vs 3.66 u comparison mixed
eval protocols: r4sin was scored on a smoother center-follow episode while
r3e used lane-follow episodes). Mirrors the reference's held-out eval
dataset idea (`/root/reference/evaluation/trajectory_data_generation.py`)
done properly: multiple drivers, disjoint track seeds, per-episode seeds +
per-frame car states recorded.

Composition (6 episodes x 2000 steps = 12k frames):
  - 2 lane-follow (left seed 900, right seed 901) — the r3-recipe driver
  - 2 center-follow (seeds 910, 911)              — the PID recipe
  - 2 sinusoidal A=5 (seeds 920, 921)             — the safe-sine recipe
Seeds 900+ are disjoint from every training set (r3: 43-92, r4sin:
300-354, r3 eval: 42) and the bench track bank (100-115).

Usage: python tools/make_shared_evalset.py [--out data/eval_shared]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from state_policy_diffusionmodel_tpu.data.collect import collect_episodes  # noqa: E402
from state_policy_diffusionmodel_tpu.data.replay_buffer import ReplayBuffer  # noqa: E402

SPEC = [
    # (driver, mode, seeds, extra kwargs)
    ("lane_follow", "left", [900], {}),
    ("lane_follow", "right", [901], {}),
    ("center_follow", "n/a", [910, 911], {}),
    ("sinusoidal", "n/a", [920, 921], {"amplitude": 5.0}),
]
N_STEPS = 2000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/eval_shared")
    ap.add_argument("--steps", type=int, default=N_STEPS)
    args = ap.parse_args()

    buffer = ReplayBuffer.create_empty_numpy()
    all_seeds, all_drivers = [], []
    for driver, mode, seeds, kw in SPEC:
        print(f"==== {driver} ({mode}) seeds {seeds}: {args.steps} steps ====")
        for ep, seed in zip(
            collect_episodes(seeds, driver=driver, mode=mode,
                             n_steps=args.steps, target_velocity=30.0,
                             return_states=True, progress=True, **kw),
            seeds,
        ):
            ep.pop("h_action", None)   # uniform keys across drivers
            buffer.add_episode(ep)
            all_seeds.append(seed)
            all_drivers.append(driver)
    buffer.meta["track_seed"] = np.asarray(all_seeds, np.int64)
    # driver id per episode (0=lane_follow, 1=center_follow, 2=sinusoidal)
    names = ["lane_follow", "center_follow", "sinusoidal"]
    buffer.meta["driver_id"] = np.asarray(
        [names.index(d) for d in all_drivers], np.int64)
    out = os.path.join(
        args.out,
        f"shared_eval_dataset_{buffer.n_episodes}_episodes_3_drivers.zarr")
    os.makedirs(args.out, exist_ok=True)
    buffer.save_to_path(out)
    print(f"saved {buffer.n_episodes} episodes / {buffer.n_steps} steps "
          f"to {out}")


if __name__ == "__main__":
    main()
