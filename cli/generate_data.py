"""Dataset generation CLI.

Parity with `/root/reference/generateData/generateParallelTraj.py:108-135`
and `generateSinusoidalTraj.py` — but episodes collect batched on device:
all episodes of a mode run as one vmapped rollout.

Examples:
  python -m cli.generate_data --modes left right --num_episodes_per_mode 2
  python -m cli.generate_data --driver sinusoidal --amplitude 5
  python -m cli.generate_data --driver center_follow --steps 1000
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime


def parse_args():
    p = argparse.ArgumentParser(description="Generate Data")
    p.add_argument("--num_episodes_per_mode", type=int, default=1)
    p.add_argument("--chunk_len", type=int, default=-1)
    p.add_argument("--dataset_name", type=str, default=None)
    p.add_argument("--base_dir", type=str, default="./data/")
    p.add_argument("--modes", nargs="+", default=["left", "right"])
    p.add_argument("--velocities", nargs="+", type=float, default=[30.0])
    p.add_argument("--driver", default="lane_follow",
                   choices=["lane_follow", "sinusoidal", "center_follow"])
    p.add_argument("--amplitude", type=float, default=5.0,
                   help="sinusoidal amplitude: 5=safe, 13=unsafe")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--seed0", type=int, default=43)
    p.add_argument("--zip", action="store_true", dest="make_zip")
    p.add_argument("--save_states", action="store_true",
                   help="ALSO pickle per-step raw sim states next to the "
                        "dataset (states_list.pkl, the reference sidecar, "
                        "generateParallelTraj.py:77-80); the zarr itself "
                        "always carries data/car_state unless "
                        "--no_car_states")
    p.add_argument("--no_car_states", action="store_true",
                   help="omit the per-frame data/car_state key (O(1) "
                        "mid-episode restore support) from the zarr")
    return p.parse_args()


def main():
    args = parse_args()
    from state_policy_diffusionmodel_tpu.data import generate_dataset
    from state_policy_diffusionmodel_tpu.data.collect import collect_episodes
    from state_policy_diffusionmodel_tpu.data.replay_buffer import ReplayBuffer

    folder = datetime.now().strftime("%Y-%m-%d-%H%M")
    name = args.dataset_name or folder
    name = name.removesuffix(".zarr")
    modes = args.modes if args.driver == "lane_follow" else ["n/a"]
    name += (f"_dataset_{args.num_episodes_per_mode}_episodes_"
             f"{len(modes)}_modes.zarr")
    out = os.path.join(args.base_dir, folder, name)
    os.makedirs(os.path.dirname(out), exist_ok=True)

    buffer = ReplayBuffer.create_empty_numpy()
    seed = args.seed0
    all_seeds = []
    states_hist = []      # across ALL modes (one pickle per dataset, matching
                          # the reference's one states_list per run)
    for mode in modes:
        print(f"==== mode {mode}: {args.num_episodes_per_mode} episodes x "
              f"{args.steps} steps (driver={args.driver}) ====")
        seeds = list(range(seed, seed + args.num_episodes_per_mode))
        seed += args.num_episodes_per_mode
        all_seeds.extend(seeds)
        episodes = collect_episodes(
            seeds, driver=args.driver, mode=mode,
            target_velocity=float(args.velocities[0]),
            amplitude=args.amplitude, n_steps=args.steps, progress=True,
            return_states=args.save_states or not args.no_car_states)
        for ep in episodes:
            if args.save_states:
                states_hist.append(ep["car_state"])
            if args.no_car_states:
                ep.pop("car_state", None)
            buffer.add_episode(ep)
    if args.save_states:
        import pickle

        # all modes' episodes, in buffer order (was: overwritten per mode)
        with open(os.path.join(os.path.dirname(out),
                               "states_list.pkl"), "wb") as f:
            pickle.dump(states_hist, f)

    # per-episode track seed (meta/track_seed) so closed-loop evals can
    # rebuild each episode's exact track
    import numpy as np
    buffer.meta["track_seed"] = np.asarray(all_seeds, np.int64)
    buffer.save_to_path(out, chunk_length=args.chunk_len,
                        make_zip=args.make_zip)
    print(f"saved {buffer.n_episodes} episodes / {buffer.n_steps} steps "
          f"to {out}")


if __name__ == "__main__":
    main()
