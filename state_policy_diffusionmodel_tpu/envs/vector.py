"""Vectorized env: vmap over a batch of tracks + lax.scan rollouts.

This is the TPU-native replacement for the reference's serial single-env
loops (e.g. `generateData/generateParallelTraj.py:24-85`): thousands of envs
step and render inside one jit-compiled scan, with auto-reset.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..track.geometry import TrackGeometry
from . import car_racing as env


def gather_geom(geoms: TrackGeometry, track_id) -> TrackGeometry:
    """Per-env view into a bank of U unique tracks. Keeping tracks unique and
    indexing inside jit avoids materializing B texture copies in HBM (a 1024
    -env batch sharing 16 tracks costs 32 MB instead of 2 GB)."""
    return jax.tree.map(lambda x: x[track_id], geoms)


def _use_fused_render() -> bool:
    """The banked Pallas texel sampler only runs on real TPUs; CPU tests and
    the virtual-device dry run take the per-env XLA path."""
    return jax.default_backend() == "tpu"


def init_batch(geoms: TrackGeometry, track_ids=None):
    if track_ids is None:
        return jax.vmap(env.init)(geoms)
    return jax.vmap(lambda t: env.init(gather_geom(geoms, t)))(track_ids)


def reset_batch(geoms: TrackGeometry, render: bool = True, track_ids=None):
    f = partial(env.reset, render=render and not _use_fused_render())
    if track_ids is None:
        states, res = jax.vmap(f)(geoms)
    else:
        states, res = jax.vmap(lambda t: f(gather_geom(geoms, t)))(track_ids)
    if render and _use_fused_render():
        res = _render_fused(states, res, geoms, track_ids, had_action=False)
    return states, res


def _render_fused(states, res, geoms, track_ids, had_action: bool):
    from ..render.raster import render_batch_banked

    if track_ids is None:
        track_ids = jnp.arange(res.reward.shape[0], dtype=jnp.int32)
    score = jax.vmap(env.render_score, in_axes=(0, None))(states, had_action)
    obs, augm = render_batch_banked(states.car, geoms.tex, track_ids,
                                    score=score)
    return res._replace(obs=obs, augmented=augm)


def step_batch(states, geoms, actions, render: bool = True, track_ids=None):
    """states/actions batched on the leading axis; geoms either stacked
    per-env (track_ids=None) or a bank of unique tracks indexed by
    track_ids (B,).

    On TPU the 96x96 frames render through the fused banked path (physics
    vmapped without render, then one batched Pallas texel-sampling kernel +
    vmapped composition); elsewhere rendering stays inside the vmapped
    per-env step."""
    fused = render and _use_fused_render()
    inner_render = render and not fused
    if track_ids is None:
        states, res = jax.vmap(
            lambda s, g, a: env.step(s, g, a, render=inner_render)
        )(states, geoms, actions)
    else:
        states, res = jax.vmap(
            lambda s, t, a: env.step(s, gather_geom(geoms, t), a,
                                     render=inner_render)
        )(states, track_ids, actions)
    if fused:
        res = _render_fused(states, res, geoms, track_ids, had_action=True)
    return states, res


@partial(jax.jit, static_argnames=("n_steps", "render", "auto_reset"))
def rollout_constant(states, geoms, actions, n_steps: int,
                     render: bool = True, auto_reset: bool = True):
    """Scan n_steps with a fixed per-env action. Returns final states and a
    stacked (n_steps, B, ...) StepResult trajectory."""

    def body(ss, _):
        ss, res = step_batch(ss, geoms, actions, render=render)
        if auto_reset:
            ss = jax.vmap(env.auto_reset)(ss, geoms)
        return ss, res

    return jax.lax.scan(body, states, None, length=n_steps)


def rollout_policy(states, geoms, policy: Callable, carry,
                   n_steps: int, render: bool = True,
                   auto_reset: bool = True):
    """Scan a closed-loop policy: actions, carry = policy(carry, states, obs).

    `policy` sees the batched previous StepResult (obs) and returns (B, 3)
    actions plus its own carry (PID integrators, observation ring buffers...).
    """

    def body(c, _):
        ss, pol_carry, prev_res = c
        actions, pol_carry = policy(pol_carry, ss, prev_res)
        ss, res = step_batch(ss, geoms, actions, render=render)
        if auto_reset:
            ss = jax.vmap(env.auto_reset)(ss, geoms)
        return (ss, pol_carry, res), res

    states, res0 = reset_batch(geoms, render=render)
    (states, carry, _), traj = jax.lax.scan(
        body, (states, carry, res0), None, length=n_steps
    )
    return states, carry, traj


def rollout_policy_sharded(mesh, params, geoms, policy: Callable, carry,
                           n_steps: int, render: bool = True,
                           auto_reset: bool = True, track_ids=None):
    """Multi-chip closed-loop policy rollout: envs and the policy's carry
    (observation rings, action queues, ...) sharded over the mesh's `data`
    axis, model params and the track bank replicated on every chip.  The
    denoiser runs per-chip on its local env shard inside shard_map — no
    collectives are needed (the policy loop is embarrassingly parallel;
    only training reduces over ICI).

    policy(params, carry, states, prev_res) -> ((B, 3) actions, carry).
    Every carry leaf must be per-env (leading batch axis) so it shards
    alongside the env states; broadcast any scalar state (frame counters)
    to (B,) or fold it into the scan inside `policy`.

    Returns (final states, final carry, (T, B, 3) actions, (T, B) rewards)
    — the actions trajectory lets callers assert sharding-invariance
    against a single-device run (green-field per SURVEY §2.9; the
    flagship-demo loop of cli/run_predictions.py and bench.py --mode
    policy at multi-chip scale)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if track_ids is None:
        geom_spec = P("data")      # stacked per-env geometry: shard it
        local_ids = True
        B = jax.tree.leaves(geoms)[0].shape[0]
        track_ids = jnp.arange(B, dtype=jnp.int32)
    else:
        geom_spec = P()            # shared bank: replicate
        local_ids = False

    def shard_body(params, geoms, carry, track_ids):
        if local_ids:
            # per-shard stacked geometry: ids are local offsets
            track_ids = jnp.arange(track_ids.shape[0], dtype=jnp.int32)
            states, res0 = reset_batch(geoms, render=render)
        else:
            states, res0 = reset_batch(geoms, render=render,
                                       track_ids=track_ids)
        # reset fields derived from constants (gas/brake/t...) trace as
        # device-invariant; mark the whole state varying over `data` so the
        # scan carry types line up with the per-shard stepped outputs
        def _vary(x):
            if "data" in getattr(jax.typeof(x), "vma", ()):
                return x
            return jax.lax.pcast(x, ("data",), to="varying")

        states, res0 = jax.tree.map(_vary, (states, res0))

        def body(c, _):
            ss, pol_carry, prev_res = c
            actions, pol_carry = policy(params, pol_carry, ss, prev_res)
            ss, res = step_batch(ss, geoms, actions, render=render,
                                 track_ids=None if local_ids else track_ids)
            if auto_reset:
                ss = jax.vmap(
                    lambda s, t: env.auto_reset(s, gather_geom(geoms, t))
                )(ss, track_ids)
            # render=False leaves constant obs placeholders (unvarying)
            ss, res = jax.tree.map(_vary, (ss, res))
            return (ss, pol_carry, res), (actions, res.reward)

        (states, carry2, _), (acts, rewards) = jax.lax.scan(
            body, (states, carry, res0), None, length=n_steps)
        return states, carry2, acts, rewards

    f = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), geom_spec, P("data"), P("data")),
        out_specs=(P("data"), P("data"), P(None, "data"), P(None, "data")),
    )
    return jax.jit(f)(params, geoms, carry, track_ids)


def rollout_constant_sharded(mesh, states, geoms, actions, n_steps: int,
                             render: bool = True, auto_reset: bool = True,
                             track_ids=None):
    """Multi-chip `rollout_constant`: envs sharded over the mesh's `data`
    axis via shard_map, track bank replicated on every chip.

    shard_map (not plain pjit sharding) so the per-shard program — including
    the Pallas texel-sampling kernel, which XLA's SPMD partitioner treats as
    an opaque custom call — runs independently per device with its local
    batch. No collectives are needed: env stepping is embarrassingly
    parallel; only training reduces over ICI.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    B = jax.tree.leaves(states.reward)[0].shape[0]
    if track_ids is None:
        track_ids = jnp.arange(B, dtype=jnp.int32)
        geom_spec = P("data")      # stacked per-env geometry: shard it
        local_ids = True
    else:
        geom_spec = P()            # shared bank: replicate
        local_ids = False

    def shard_body(states, geoms, actions, track_ids):
        if local_ids:
            # per-shard stacked geometry: ids are local offsets
            track_ids = jnp.arange(track_ids.shape[0], dtype=jnp.int32)

        def body(ss, _):
            ss, res = step_batch(ss, geoms, actions, render=render,
                                 track_ids=track_ids)
            if auto_reset:
                ss = jax.vmap(
                    lambda s, t: env.auto_reset(s, gather_geom(geoms, t))
                )(ss, track_ids)
            return ss, res

        return jax.lax.scan(body, states, None, length=n_steps)

    f = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P("data"), geom_spec, P("data"), P("data")),
        out_specs=(P("data"), P(None, "data")),  # traj is (T, B, ...)
    )
    return jax.jit(f)(states, geoms, actions, track_ids)
