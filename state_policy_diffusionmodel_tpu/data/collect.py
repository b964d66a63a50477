"""On-device dataset generation: batched envs + drivers under one lax.scan.

Replaces the reference's serial data-gen loops
(`/root/reference/generateData/generateParallelTraj.py:24-85`,
`generateSinusoidalTraj.py:29-110`): B episodes collect simultaneously on
one chip; histories stream back to the host in scan-chunks.

Record alignment matches the reference exactly: at step t the episode stores
the *post-step* observation image together with the *pre-step* pose/velocity
and the action applied (the reference appends `obs` from `env.step` but
pose from the previous step's `info`, generateParallelTraj.py:56-70).
Images are stored /255 as float32 (trajectory_control_utils.py:170).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import control, envs, physics
from ..track import build as build_track, make_track, stack as stack_tracks
from ..track.geometry import TrackGeometry
from .replay_buffer import ReplayBuffer


@partial(jax.jit, static_argnames=("n_steps", "driver"))
def _collect_chunk(states, results, ctrl_states, geoms, ctrl_params,
                   step_idx0, n_steps: int, driver: str):
    """Scan n_steps; returns stacked (T, B, ...) records."""

    def body(carry, i):
        state, res, ctrl = carry
        speed = jax.vmap(jnp.linalg.norm)(res.info.car_velocity)
        if driver == "lane_follow":
            action, ctrl = jax.vmap(control.lane_follow, in_axes=(None, 0, 0, 0))(
                ctrl_params, ctrl, res.augmented, speed)
        elif driver == "center_follow":
            action = jax.vmap(control.center_follow, in_axes=(0, 0, None))(
                res.obs, speed, ctrl_params["target_velocity"])
        elif driver == "sinusoidal":
            action = jax.vmap(
                control.sinusoidal, in_axes=(0, 0, None, None, None, None)
            )(state.car, geoms, (step_idx0 + i).astype(jnp.float32),
              ctrl_params["amplitude"], ctrl_params["freq"],
              ctrl_params["target_velocity"])
        else:
            raise ValueError(driver)

        record_pre = {
            "position": res.info.car_position,
            "velocity": res.info.car_velocity,
            "angle": res.info.car_angle,
        }
        state, res = envs.vector.step_batch(state, geoms, action)
        record = dict(record_pre, img=res.obs, action=action,
                      car_state=jax.vmap(physics.save_state)(state.car))
        return (state, res, ctrl), record

    (states, results, ctrl_states), records = jax.lax.scan(
        body, (states, results, ctrl_states), jnp.arange(n_steps))
    return states, results, ctrl_states, records


def collect_episodes(
    seeds,
    driver: str = "lane_follow",
    mode: str = "middle",
    target_velocity: float = 30.0,
    amplitude: float = 5.0,
    freq: float = 1.0 / 100.0,
    n_steps: int = 1000,
    chunk: int = 250,
    geoms: Optional[TrackGeometry] = None,
    progress: bool = False,
    return_states: bool = False,
) -> list[Dict[str, np.ndarray]]:
    """Run B = len(seeds) episodes in parallel; returns per-episode dicts in
    the reference dataset schema (img/velocity/position/action/angle)."""
    if geoms is None:
        geoms = stack_tracks([build_track(make_track(int(s))) for s in seeds])
    B = len(seeds)

    states, results = envs.vector.reset_batch(geoms)
    if driver == "lane_follow":
        ctrl_params = control.lane_follow_params(mode, target_velocity)
        ctrl_states = jax.vmap(lambda _: control.lane_follow_init())(jnp.arange(B))
    else:
        ctrl_params = {"target_velocity": jnp.asarray(target_velocity),
                       "amplitude": jnp.asarray(amplitude),
                       "freq": jnp.asarray(freq)}
        ctrl_states = jnp.zeros(B)  # unused carry

    host_records = []
    done = 0
    while done < n_steps:
        n = min(chunk, n_steps - done)
        states, results, ctrl_states, records = _collect_chunk(
            states, results, ctrl_states, geoms, ctrl_params,
            jnp.asarray(done, jnp.int32), n, driver)
        host_records.append(jax.tree.map(np.asarray, records))
        done += n
        if progress:
            print(f"  collected {done}/{n_steps} steps x {B} envs")

    merged = jax.tree.map(lambda *xs: np.concatenate(xs, 0), *host_records)
    episodes = []
    for b in range(B):
        ep = {
            "img": merged["img"][:, b].astype(np.float32) / 255.0,
            "velocity": merged["velocity"][:, b].astype(np.float32),
            "position": merged["position"][:, b].astype(np.float32),
            "action": np.nan_to_num(merged["action"][:, b].astype(np.float32)),
            "angle": merged["angle"][:, b].astype(np.float32),
        }
        if driver == "sinusoidal":
            # reference schema parity: sinusoidal datasets carry a
            # "human action" placeholder equal to the executed action
            # (generateSinusoidalTraj.py:101,177)
            ep["h_action"] = ep["action"].copy()
        if return_states:
            # per-step raw sim states (_save_state vectors) — the
            # reference pickles these as states_list.pkl
            # (generateParallelTraj.py:71-80)
            ep["car_state"] = merged["car_state"][:, b].astype(np.float32)
        episodes.append(ep)
    return episodes


def generate_dataset(
    path: str,
    episodes_per_mode: int = 1,
    modes=("left", "right"),
    driver: str = "lane_follow",
    n_steps: int = 1000,
    target_velocity: float = 30.0,
    seed0: int = 43,
    make_zip: bool = False,
    save_states: bool = True,
    **kw,
) -> ReplayBuffer:
    """End-to-end dataset generation into the reference zarr schema.

    save_states persists the per-frame (30,) `physics.save_state` vector as
    a `data/car_state` key — the reference's `states_list.pkl` sidecar
    (generateParallelTraj.py:77-80) — so eval can O(1)-restore the env at
    any frame via `envs.reset_car` instead of replaying the episode prefix.
    """
    buffer = ReplayBuffer.create_empty_numpy()
    seed = seed0
    all_seeds = []
    for mode in modes:
        seeds = list(range(seed, seed + episodes_per_mode))
        seed += episodes_per_mode
        all_seeds.extend(seeds)
        for ep in collect_episodes(
            seeds, driver=driver, mode=mode, n_steps=n_steps,
            target_velocity=target_velocity, return_states=save_states, **kw,
        ):
            buffer.add_episode(ep)
    # per-episode track seed so eval replays can rebuild the exact track
    buffer.meta["track_seed"] = np.asarray(all_seeds, np.int64)
    if path:
        buffer.save_to_path(path, make_zip=make_zip)
    return buffer
