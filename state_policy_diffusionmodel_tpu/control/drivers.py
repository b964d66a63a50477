"""The reference's data-generation drivers as pure, vmappable functions.

Three controller families, mirroring `/root/reference`:

1. `lane_follow` — the parallel-lane follower
   (`generateData/trajectory_control_utils.py:76-109`): scan row 60 of the
   *augmented* frame for the selected colored lane, pick the pixel nearest
   col 48, cascade two moving-average filters, steer with a persistent
   PID(0.8, 0.01, 0.06) and split a velocity PID(0.005, 0.001, 0.0005) into
   gas-or-brake.  This is image-space, running on our rendered frames —
   exactly how the reference manufactures its "human driver" data.

2. `center_follow` — the strip-based center follower
   (`utils/functions.py:120-175`): grass-mask a 20-row strip, find road
   middle on its upper/lower edges, steer on the angular error.  The
   reference re-creates its PID objects every call, so they degenerate to
   pure P control — reproduced as such.

3. `sinusoidal` — the sinusoidal lane-weaver
   (`utils/functions.py:38-77,177-209`): target = track middle + 10 px along
   the tangent + A*sin(2*pi*f*(t+1)) along the normal.  The reference finds
   the middle/tangent with OpenCV Canny on the grass mask; here they come
   analytically from track geometry transformed into the same pixel frame
   (the colored lanes/edges are known polylines — pixel-space detection was
   an artifact of the reference design).  Amplitude 5 = "safe", 13 =
   "unsafe" (`generateData/generateSinusoidalTraj.py:121,195`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import CarState, hull_com_velocity
from ..render import camera
from ..track.geometry import TrackGeometry, nearest_segment
from .pid import (
    PIDParams, PIDState, RingBuffer, pid_init, pid_params, pid_update,
    ring_init, ring_mean, ring_push,
)

F32 = jnp.float32

# mode -> lane channel index (texture palette): lleft..rright = 1..5
MODES = ("lleft", "left", "middle", "right", "rright")

# RGB inRange bounds per mode (trajectory_control_utils.py:8-34)
_LANE_BOUNDS = np.array([
    [[100, 100, 0], [255, 255, 0]],      # lleft  : yellow
    [[0, 100, 100], [0, 255, 255]],      # left   : cyan
    [[100, 0, 100], [255, 0, 255]],      # middle : magenta
    [[100, 0, 100], [200, 50, 200]],     # right  : purple
    [[0, 0, 100], [0, 0, 255]],          # rright : blue
], np.uint8)

STRIP_ROW = 60        # trajectory_control_utils.py:79
CAR_PX = jnp.array([70.0, 48.0])  # (row, col) car pixel position


class LaneFollowState(NamedTuple):
    pid_steer: PIDState
    pid_vel: PIDState
    err_buf: RingBuffer       # len 10
    err_buf2: RingBuffer      # len 3
    vel_buf: RingBuffer       # len 7
    last_action: jax.Array    # (3,) reused when the lane is not visible


class LaneFollowParams(NamedTuple):
    steer: PIDParams
    vel: PIDParams
    mode: jax.Array           # int32 lane index 0..4


def lane_follow_params(mode: int | jax.Array, target_velocity=30.0) -> LaneFollowParams:
    """PID gains from generateParallelTraj.py:41-42."""
    if isinstance(mode, str):
        mode = MODES.index(mode)
    return LaneFollowParams(
        steer=pid_params(0.8, 0.01, 0.06, 0.0),
        vel=pid_params(0.005, 0.001, 0.0005, target_velocity),
        mode=jnp.asarray(mode, jnp.int32),
    )


def lane_follow_init() -> LaneFollowState:
    return LaneFollowState(
        pid_steer=pid_init(), pid_vel=pid_init(),
        err_buf=ring_init(10), err_buf2=ring_init(3), vel_buf=ring_init(7),
        last_action=jnp.zeros(3, F32),
    )


def _lane_mask_row(augm: jax.Array, mode: jax.Array) -> jax.Array:
    """(96,) bool: lane pixels on image row STRIP_ROW."""
    row = augm[STRIP_ROW].astype(jnp.int32)               # (96, 3)
    lo = jnp.asarray(_LANE_BOUNDS[:, 0], jnp.int32)[mode]
    hi = jnp.asarray(_LANE_BOUNDS[:, 1], jnp.int32)[mode]
    return jnp.all((row >= lo) & (row <= hi), axis=-1)


def lane_follow(
    params: LaneFollowParams, state: LaneFollowState,
    augm: jax.Array, speed: jax.Array,
):
    """One control tick. augm: (96,96,3) uint8 augmented frame; speed: |v|.

    Returns (action (3,), new_state). When the lane is not visible on the
    strip, the previous action is repeated and no state updates happen
    (generateParallelTraj.py:62-66)."""
    mask = _lane_mask_row(augm, params.mode)
    found = jnp.any(mask)
    cols = jnp.arange(96, dtype=F32)
    col = cols[jnp.argmin(jnp.where(mask, jnp.abs(cols - 48.0), 1e9))]

    err = jnp.clip(col - 48.0, -5.0, 5.0)
    err = jnp.where(jnp.abs(err) <= 2.0, 0.3 * err, err)

    err_buf = ring_push(state.err_buf, err)
    err_avg = ring_mean(err_buf)
    err_buf2 = ring_push(state.err_buf2, err_avg)
    err_avg2 = ring_mean(err_buf2)

    # angle to target: arctan2(|err|, |row dist|) with sign flip
    # (trajectory_control_utils.py:58-62); car2point row dist is -10.
    angle = jnp.arctan2(jnp.abs(err_avg2), 10.0)
    angle = jnp.where(err_avg2 > 0, -angle, angle)
    steer, pid_steer = pid_update(params.steer, state.pid_steer, angle)

    err_vel = params.vel.setpoint - speed
    err_vel = jnp.where(jnp.abs(err_vel) < 2.0, 0.0, err_vel)
    vel_buf = ring_push(state.vel_buf, err_vel)
    err_vel_avg = ring_mean(vel_buf)
    vel_out, pid_vel = pid_update(params.vel, state.pid_vel, speed)
    gas = jnp.where(err_vel_avg < 0, 0.0, vel_out)
    brake = jnp.where(err_vel_avg < 0, jnp.clip(jnp.abs(vel_out), 0.0, 0.9), 0.0)

    action = jnp.stack([steer, gas, brake]).astype(F32)

    new_state = LaneFollowState(pid_steer, pid_vel, err_buf, err_buf2,
                                vel_buf, action)
    # freeze everything when the lane was not found
    out_state = jax.tree.map(
        lambda new, old: jnp.where(found, new, old), new_state, state
    )
    action = jnp.where(found, action, state.last_action)
    return action, out_state


# ---------------------------------------------------------------------------
# strip-based center follower (calculateAction, utils/functions.py:120-175)
# ---------------------------------------------------------------------------

def _grass_mask(img: jax.Array) -> jax.Array:
    """Grass pixels: the reference's HSV green mask (functions.py:8-9,131-135)
    reduces, on our exact-palette frames, to 'green dominates red and blue'."""
    img = img.astype(jnp.int32)
    g = img[..., 1]
    return (g - jnp.maximum(img[..., 0], img[..., 2])) > 30


def _edge_from_middle(line: jax.Array, direction: str) -> jax.Array:
    """First nonzero scanning from col 48 (functions.py:80-95); -1 if none."""
    cols = jnp.arange(96)
    if direction == "left":
        cand = jnp.where(line & (cols <= 48), cols, -1)
        return jnp.max(cand)
    cand = jnp.where(line & (cols >= 48), cols, 200)
    found = jnp.min(cand)
    return jnp.where(found == 200, -1, found)


def _middle_point(line: jax.Array) -> jax.Array:
    i1 = _edge_from_middle(line, "left")
    i2 = _edge_from_middle(line, "right")
    i1 = jnp.where(i1 == -1, 0, i1)
    i2 = jnp.where(i2 == -1, 95, i2)
    return (i1 + i2) // 2


def center_follow(obs: jax.Array, speed: jax.Array, target_velocity=30.0):
    """calculateAction: P-control on strip middle (fresh PIDs degenerate to
    pure P, functions.py:147-175). Returns action (3,)."""
    grass = _grass_mask(obs)
    upper = grass[55]      # strip rows 55..74; upper edge = row 55
    lower = grass[74]
    mid_u = _middle_point(upper).astype(F32)
    mid_l = _middle_point(lower).astype(F32)
    # distance/angle errors (functions.py:111-117)
    angle_err = jnp.arctan((48.0 - mid_u) / 20.0)
    control_ang = 0.5 * (0.0 - angle_err)          # PID(0.5,...) fresh -> P
    control_vel = 0.05 * (target_velocity - speed)
    gas = jnp.maximum(control_vel, 0.0)
    brake = jnp.maximum(-control_vel, 0.0)
    action = jnp.stack([
        jnp.clip(control_ang, -1.0, 1.0),
        jnp.clip(gas, 0.0, 1.0),
        jnp.clip(brake, 0.0, 1.0),
    ]).astype(F32)
    return action


# ---------------------------------------------------------------------------
# sinusoidal weaver (action_sinusoidalTrajectory, functions.py:177-209)
# ---------------------------------------------------------------------------

def _world_to_pixel(p, scroll, cam_angle):
    """World point -> (row, col) pixel coords of the state image."""
    w = camera.world_to_window(p, scroll, cam_angle)
    col = w[..., 0] * camera.STATE_W / camera.WINDOW_W
    row = 95.5 - w[..., 1] * camera.STATE_H / camera.WINDOW_H
    return jnp.stack([row, col], axis=-1)


def sinusoidal(
    car: CarState, geom: TrackGeometry, t: jax.Array,
    amplitude=5.0, freq=1.0 / 100.0, target_velocity=30.0,
    scale_dist=10.0,
):
    """Sinusoidal trajectory action from analytic geometry. t: step index."""
    vel = hull_com_velocity(car)
    cam = camera.camera_angle(car.angle, vel)
    q = nearest_segment(geom, car.pos)

    middle_px = _world_to_pixel(q.closest, car.pos, cam)
    ahead_px = _world_to_pixel(q.closest + q.tangent, car.pos, cam)
    tvec = ahead_px - middle_px
    tvec = tvec / jnp.maximum(jnp.linalg.norm(tvec), 1e-9)
    # point along car direction (up the image = (-1, 0) in (row, col))
    tvec = jnp.where(tvec[0] > 0, -tvec, tvec)
    perp = jnp.stack([-tvec[1], tvec[0]])  # cross(t, perp) > 0 by construction

    sin_coeff = amplitude * jnp.sin((t + 1.0) * freq * 2.0 * jnp.pi)
    target = middle_px + tvec * scale_dist + sin_coeff * perp

    err = target - CAR_PX
    car_vec = jnp.array([-1.0, 0.0])
    denom = jnp.maximum(jnp.linalg.norm(err), 1e-9)
    angle = jnp.arccos(jnp.clip(jnp.dot(err, car_vec) / denom, -1.0, 1.0))
    angle = jnp.where(err[1] > 0, -angle, angle)

    steering = 0.5 * (0.0 - angle)                 # fresh PID(0.5,-0.2,0) -> P
    speed = jnp.linalg.norm(vel)
    acc = 0.05 * (target_velocity - speed)         # fresh PID(0.05,...) -> P
    gas = jnp.maximum(acc, 0.0)
    brake = jnp.maximum(-acc, 0.0)
    return jnp.stack([steering, gas, brake]).astype(F32)
