"""Functional CarRacing environment (reset/step/render as pure functions).

The reference env (`/root/reference/envs/car_racing.py:129-483`) couples a
Box2D world, a GL viewer and python-object bookkeeping; here the env is a
pure function over explicit pytrees, so it jit-compiles, vmaps over
thousands of envs, and checkpoints for free.

Semantics reproduced:
- `step(action)`: steer(-a0)/gas(a1)/brake(a2), `car.step(1/50)` +
  `world.Step` (one fused physics step here), reward -0.1/frame and
  +1000/len(track) per newly visited tile, done on all-tiles-visited or
  |x|,|y| > PLAYFIELD (step_reward -100) (car_racing.py:449-483).
- Tile contact / friction via nearest-centerline-segment queries instead of
  the Box2D FrictionDetector (car_racing.py:89-126): a wheel is on a tile
  when its center is within TRACK_WIDTH of the centerline; grass gives
  0.6x friction (car_dynamics.py:235-241).
- `reset` places the car at track[0] and performs one actionless step
  (car_racing.py:421-447).
- `info` carries the augmented image, pose and velocity (car_racing.py:477-481).

Track generation is host-side (see `track.generator`); a jitted in-place
`auto_reset` reuses the same track (fresh tracks are swapped in from the
host between rollouts).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import physics
from ..physics import CarState, constants as C
from ..track.generator import PLAYFIELD, TRACK_WIDTH
from ..track.geometry import TrackGeometry, nearest_segment
from ..render import Overlay, raster

F32 = jnp.float32


class EnvState(NamedTuple):
    car: CarState
    visited: jax.Array        # (P,) bool per-tile visited flags
    tile_count: jax.Array     # () int32
    reward: jax.Array         # () cumulative reward
    prev_reward: jax.Array    # ()
    t: jax.Array              # () sim time
    done: jax.Array           # () bool
    wheel_on_road: jax.Array  # (4,) bool, contact state after last step
    wheel_tile: jax.Array     # (4,) int32 nearest tile per wheel


class StepInfo(NamedTuple):
    """The reference step() info dict (car_racing.py:477-481)."""

    car_position: jax.Array   # (2,)
    car_velocity: jax.Array   # (2,) hull COM velocity
    car_angle: jax.Array      # ()


class StepResult(NamedTuple):
    obs: jax.Array            # (96, 96, 3) uint8 state frame
    augmented: jax.Array      # (96, 96, 3) uint8 augmented frame
    reward: jax.Array         # () step reward
    done: jax.Array           # () bool
    info: StepInfo


def _wheel_contacts(car: CarState, geom: TrackGeometry):
    rot_c, rot_s = jnp.cos(car.angle), jnp.sin(car.angle)
    wp = jnp.asarray(C.WHEEL_POSITIONS, F32)
    wheel_world = car.pos + jnp.stack(
        [rot_c * wp[:, 0] - rot_s * wp[:, 1],
         rot_s * wp[:, 0] + rot_c * wp[:, 1]], -1)
    q = jax.vmap(lambda p: nearest_segment(geom, p))(wheel_world)
    return q.idx, q.dist <= TRACK_WIDTH


def _friction(on_road: jax.Array) -> jax.Array:
    return jnp.where(on_road, C.FRICTION_LIMIT, C.FRICTION_LIMIT * C.GRASS_FRICTION)


def init(geom: TrackGeometry) -> EnvState:
    """Fresh state with the car at the track start (before the reset step)."""
    car = physics.create(geom.start[0], geom.start[1], geom.start[2])
    idx, on_road = _wheel_contacts(car, geom)
    P = geom.valid.shape[0]
    return EnvState(
        car=car,
        visited=jnp.zeros(P, bool),
        tile_count=jnp.asarray(0, jnp.int32),
        reward=jnp.asarray(0.0, F32),
        prev_reward=jnp.asarray(0.0, F32),
        t=jnp.asarray(0.0, F32),
        done=jnp.asarray(False),
        wheel_on_road=on_road,
        wheel_tile=idx,
    )


def physics_step(
    state: EnvState, geom: TrackGeometry, action: Optional[jax.Array]
) -> EnvState:
    """Everything of `step()` except rendering (usable as step_noRender,
    envWrapper.py:13-28)."""
    car = state.car
    if action is not None:
        car = physics.apply_action(car, action)

    friction = _friction(state.wheel_on_road)
    car = physics.step(car, friction, C.DT)

    # contact + visited-tile bookkeeping on the post-step pose
    idx, on_road = _wheel_contacts(car, geom)
    newly = jnp.zeros_like(state.visited).at[idx].set(on_road) & ~state.visited
    n_new = jnp.sum(newly)
    visited = state.visited | newly
    tile_count = state.tile_count + n_new.astype(jnp.int32)
    tile_reward = 1000.0 / geom.n.astype(F32) * n_new.astype(F32)

    reward = state.reward + tile_reward
    if action is not None:
        reward = reward - 0.1
        car = car._replace(fuel_spent=jnp.zeros_like(car.fuel_spent))

    out = (jnp.abs(car.pos[0]) > PLAYFIELD) | (jnp.abs(car.pos[1]) > PLAYFIELD)
    done = (tile_count >= geom.n) | out

    return EnvState(
        car=car,
        visited=visited,
        tile_count=tile_count,
        reward=reward,
        prev_reward=state.prev_reward,
        t=state.t + C.DT,
        done=done,
        wheel_on_road=on_road,
        wheel_tile=idx,
    )


def _finish(state: EnvState, had_action: bool):
    """Step-reward accounting (car_racing.py:461-476)."""
    step_reward = jnp.where(
        jnp.asarray(had_action), state.reward - state.prev_reward, 0.0
    )
    out = (jnp.abs(state.car.pos[0]) > PLAYFIELD) | (
        jnp.abs(state.car.pos[1]) > PLAYFIELD
    )
    step_reward = jnp.where(out, -100.0, step_reward)
    state = state._replace(prev_reward=state.reward)
    return state, step_reward


def render_score(state: EnvState, had_action: bool) -> jax.Array:
    """The value the score label shows at render time: the reference renders
    BEFORE this frame's -0.1 deduction (car_racing.py:459 vs :464), which
    physics_step has already applied when an action was given."""
    return state.reward + (0.1 if had_action else 0.0)


def step(
    state: EnvState,
    geom: TrackGeometry,
    action: Optional[jax.Array],
    overlay: Optional[Overlay] = None,
    render: bool = True,
) -> tuple[EnvState, StepResult]:
    state = physics_step(state, geom, action)
    state, step_reward = _finish(state, action is not None)

    if render:
        obs, augm = raster.render(state.car, geom, overlay,
                                  score=render_score(state, action is not None))
    else:
        obs = jnp.zeros((96, 96, 3), jnp.uint8)
        augm = obs

    info = StepInfo(
        car_position=state.car.pos,
        car_velocity=physics.hull_com_velocity(state.car),
        car_angle=state.car.angle,
    )
    return state, StepResult(obs, augm, step_reward, state.done, info)


def reset(geom: TrackGeometry, render: bool = True) -> tuple[EnvState, StepResult]:
    """Reference reset(): place car, then one actionless step
    (car_racing.py:421-447)."""
    return step(init(geom), geom, None, render=render)


def reset_car(state: EnvState, saved: jax.Array) -> EnvState:
    """EnvWrapper.reset_car (envWrapper.py:30-32): restore a saved car state
    into the current episode."""
    return state._replace(car=physics.restore_state(saved))


def auto_reset(state: EnvState, geom: TrackGeometry) -> EnvState:
    """Where done, restart the episode on the same track (in-jit)."""
    fresh = init(geom)
    return jax.tree.map(
        lambda f, s: jnp.where(state.done, f, s), fresh, state
    )
