"""Closed-loop action replay in the env — the eval suite's workhorse.

The reference eval scripts re-execute predicted actions in a
deterministically-seeded env (`/root/reference/evaluation/eval_precision.py:
119-137`, `eval_consistency_diffusion_actions.py:160-193`): reset with a
fixed seed, replay the dataset's actions to the window start, then execute
the candidate actions — either zero-order-hold across `step_size` frames
(precision) or with per-frame linear interpolation between the sparse
actions (consistency, `interpolate_actions` :27-29).

Here the whole replay is one jitted `lax.scan`, vmappable over N candidate
action sequences at once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import envs
from ..track.geometry import TrackGeometry


def interpolate_actions(sparse: jax.Array, step_size: int) -> jax.Array:
    """(T, 3) sparse actions -> ((T-1)*step_size, 3) per-frame actions via
    linear interpolation (eval_consistency_diffusion_actions.py:27-29)."""
    T = sparse.shape[0]
    t = jnp.arange((T - 1) * step_size) / step_size
    lo = jnp.floor(t).astype(jnp.int32)
    w = (t - lo)[:, None]
    return sparse[lo] * (1 - w) + sparse[lo + 1] * w


def hold_actions(sparse: jax.Array, step_size: int) -> jax.Array:
    """Zero-order-hold replay (eval_precision.py:127-137)."""
    return jnp.repeat(sparse, step_size, axis=0)


@partial(jax.jit, static_argnames=("n_steps",))
def replay(geom: TrackGeometry, state: envs.EnvState,
           actions: jax.Array, n_steps: int):
    """Execute per-frame actions from `state`; returns (final_state,
    positions (n_steps, 2), info trajectory)."""

    def body(s, a):
        s, res = envs.step(s, geom, a, render=False)
        return s, (res.info.car_position, res.info.car_velocity, res.reward)

    state, (pos, vel, rew) = jax.lax.scan(
        body, state, actions[:n_steps])
    return state, pos, (vel, rew)


def state_at_window_start(geom: TrackGeometry, dataset_actions: np.ndarray,
                          n_warmup_frames: int):
    """Reset the env and replay the dataset's own actions for
    `n_warmup_frames` dense frames (the reference's warm-up loop,
    eval_consistency_diffusion_actions.py:168-171: `start_idx +
    obs_horizon * step_size` frames — i.e. through the END of the
    observation span, since the predicted actions correspond to
    post-observation time)."""
    state, _ = envs.reset(geom, render=False)
    if n_warmup_frames > 0:
        acts = jnp.asarray(dataset_actions[:n_warmup_frames])
        state, _, _ = replay(geom, state, acts, int(n_warmup_frames))
    return state


def replay_batch(geom: TrackGeometry, state: envs.EnvState,
                 action_batch: jax.Array, n_steps: int):
    """vmap replay over N candidate action sequences from one start state."""
    return jax.vmap(lambda a: replay(geom, state, a, n_steps))(action_batch)
