"""Camera model of the reference viewer.

Replicates the transform chain of `CarRacing.render`
(`/root/reference/envs/car_racing.py:498-599`): a fixed zoom of
SCALE*ZOOM = 16.2, translation keeping the car at (WINDOW_W/2, WINDOW_H/4),
rotation following the velocity heading when |v| > 0.5 (else the hull angle),
then the 1000x800 logical window squeezed anisotropically onto the 96x96
state viewport and flipped vertically by the `glReadPixels` readback
(`arr[::-1]`, car_racing.py:580-582).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

STATE_W = 96
STATE_H = 96
WINDOW_W = 1000.0
WINDOW_H = 800.0
SCALE = 6.0
ZOOM = 2.7
CAM_ZOOM = SCALE * ZOOM  # 16.2


def camera_angle(hull_angle: jax.Array, hull_vel: jax.Array) -> jax.Array:
    """car_racing.py:525-528: rotation follows velocity heading when moving."""
    speed = jnp.linalg.norm(hull_vel)
    vel_angle = jnp.arctan2(hull_vel[0], hull_vel[1])
    return jnp.where(speed > 0.5, vel_angle, -hull_angle)


def world_to_window(p: jax.Array, scroll: jax.Array, angle: jax.Array) -> jax.Array:
    """World -> logical window coords (car lands at (W/2, H/4)).

    The GL chain is translate(T) . rotate(angle) . scale(zoom) with
    T = (W/2, H/4) - R(angle) @ (zoom * scroll)  (car_racing.py:529-536).
    p: (..., 2).
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    rel = p - scroll
    rx = CAM_ZOOM * (c * rel[..., 0] - s * rel[..., 1])
    ry = CAM_ZOOM * (s * rel[..., 0] + c * rel[..., 1])
    return jnp.stack([rx + WINDOW_W / 2, ry + WINDOW_H / 4], axis=-1)


def window_to_world(w: jax.Array, scroll: jax.Array, angle: jax.Array) -> jax.Array:
    """Inverse of `world_to_window`."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    rx = (w[..., 0] - WINDOW_W / 2) / CAM_ZOOM
    ry = (w[..., 1] - WINDOW_H / 4) / CAM_ZOOM
    px = c * rx + s * ry
    py = -s * rx + c * ry
    return jnp.stack([px + scroll[..., 0], py + scroll[..., 1]], axis=-1)


def pixel_window_centers() -> jax.Array:
    """(96, 96, 2) logical-window coords of each state-image pixel center.

    Pixel (row r, col c) of the returned (flipped) image maps to framebuffer
    pixel (x=c, y=STATE_H-1-r); centers at +0.5.
    """
    r = jnp.arange(STATE_H)
    c = jnp.arange(STATE_W)
    rr, cc = jnp.meshgrid(r, c, indexing="ij")
    wx = (cc + 0.5) * (WINDOW_W / STATE_W)
    wy = (STATE_H - 1 - rr + 0.5) * (WINDOW_H / STATE_H)
    return jnp.stack([wx, wy], axis=-1).astype(jnp.float32)


def pixel_world_coords(scroll: jax.Array, angle: jax.Array) -> jax.Array:
    """(96, 96, 2) world coords of every state-image pixel center."""
    return window_to_world(pixel_window_centers(), scroll, angle)
