"""Pure-jnp 96x96 rasterizer for the CarRacing state image.

Replaces the reference's per-step double OpenGL rasterization + glReadPixels
readback (`/root/reference/envs/car_racing.py:498-599`) with a fused array
program: one camera-transformed gather from the per-track palette texture
plus analytic compositing of the grass checker, car polygons, HUD bars and
(optionally) predicted-trajectory overlays.  Both the normal and the
augmented frame come from the same pass under two palettes.

Draw order matches the GL pass exactly: background -> road texture ->
[augmented: lanes] -> points buffer -> wheels (with white rims) -> hull ->
HUD.  vmap over envs for batched rendering.

Known divergence from the reference (documented): the pyglet score label
(bottom-left "0000" text, car_racing.py:774) is not rasterized.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import CarState, constants as C, hull_com_velocity
from ..track.generator import PLAYFIELD
from ..track.geometry import TrackGeometry, sample_texture
from ..track import texture as textures
from . import camera

F32 = jnp.float32

# ---------------------------------------------------------------------------
# static car polygon table (body-frame), padded to (NPOLY, MAXV, 2)
# ---------------------------------------------------------------------------
MAXV = 8


def _pad(poly):
    v = np.asarray(poly, np.float32) * C.SIZE
    n = len(v)
    out = np.zeros((MAXV, 2), np.float32)
    out[:n] = v
    out[n:] = v[-1]  # repeat last vertex: degenerate edges are harmless
    return out


HULL_POLYS = np.stack([
    _pad(C.HULL_POLY1), _pad(C.HULL_POLY2), _pad(C.HULL_POLY3), _pad(C.HULL_POLY4)
])  # (4, 8, 2)

WHEEL_POLY = _pad([
    (-C.WHEEL_W, +C.WHEEL_R), (+C.WHEEL_W, +C.WHEEL_R),
    (+C.WHEEL_W, -C.WHEEL_R), (-C.WHEEL_W, -C.WHEEL_R),
])  # (8, 2)

HULL_COLOR = np.array([0.8, 0.0, 0.0], np.float32)
WHEEL_COLOR = np.array([0.0, 0.0, 0.0], np.float32)
WHEEL_WHITE = np.array([0.3, 0.3, 0.3], np.float32)
POINTS_COLOR = np.array([1.0, 0.0, 0.0], np.float32)

GRASS_K = PLAYFIELD / 20.0


class Overlay(NamedTuple):
    """Predicted-trajectory polylines (the `add_points2Buffer` hook,
    car_racing.py:704-710): world-frame line strips drawn in red."""

    points: jax.Array   # (K, L, 2)
    valid: jax.Array    # (K,) bool


def _rot2(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


WINDOW = 128  # texture window size (texels); the 96x96 viewport spans at
# most ~122 texels diagonally at the fixed zoom, so a 128-window centered on
# the visible region always covers every in-field pixel.


def _sample_texture_mxu(geom: TrackGeometry, pw: jax.Array):
    """Palette lookup via MXU one-hot matmuls instead of a random gather.

    TPU has no efficient per-lane gather: XLA lowers the naive
    `tex[i, j]` to a scalar loop (~200us/frame measured). Instead we
    dynamic-slice a 128x128 window of the texture around the viewport
    (contiguous DMA), pack the two palette channels into one integer, and
    evaluate sample[p] = sum_ij onehotI[p,i] * V[i,j] * onehotJ[p,j] as a
    (9216,128)@(128,128) matmul plus an elementwise reduction — exact
    nearest-neighbor sampling on the systolic array.

    pw: (96, 96, 2) world coords. Returns (base_idx, lane_idx) int32.
    """
    tex_size = geom.tex.shape[0]
    s = tex_size / (2.0 * PLAYFIELD)
    f = (pw + PLAYFIELD) * s                      # float texel coords
    fi = jnp.floor(f[..., 0]).astype(jnp.int32)
    fj = jnp.floor(f[..., 1]).astype(jnp.int32)
    infield = jnp.all((f >= 0) & (f < tex_size), axis=-1)

    big = jnp.int32(10 * tex_size)
    oi = jnp.clip(jnp.min(jnp.where(infield, fi, big)), 0, tex_size - WINDOW)
    oj = jnp.clip(jnp.min(jnp.where(infield, fj, big)), 0, tex_size - WINDOW)

    win = jax.lax.dynamic_slice(geom.tex, (oi, oj, 0), (WINDOW, WINDOW, 2))
    packed = (win[..., 0].astype(jnp.int32) * 8
              + win[..., 1].astype(jnp.int32)).astype(jnp.bfloat16)

    li = (fi - oi).reshape(-1)                    # (9216,) window-local rows
    lj = (fj - oj).reshape(-1)
    iw = jax.lax.broadcasted_iota(jnp.int32, (WINDOW,), 0)
    onehot_i = (li[:, None] == iw[None, :]).astype(jnp.bfloat16)
    onehot_j = (lj[:, None] == iw[None, :]).astype(jnp.bfloat16)

    rows = jnp.dot(onehot_i, packed,
                   preferred_element_type=jnp.float32)   # (9216, 128)
    vals = jnp.sum(rows * onehot_j.astype(jnp.float32), axis=-1)
    vals = jnp.round(vals).astype(jnp.int32).reshape(pw.shape[:2])
    vals = jnp.where(infield, vals, 0)
    return vals // 8, vals % 8


def _point_in_convex(pw, verts):
    """pw: (H, W, 2); verts: (V, 2) convex polygon (either winding).
    Returns (H, W) bool."""
    a = verts
    b = jnp.roll(verts, -1, axis=0)
    e = b - a                                     # (V, 2)
    d0 = pw[..., None, 0] - a[:, 0]               # (H, W, V)
    d1 = pw[..., None, 1] - a[:, 1]
    cross = e[:, 0] * d1 - e[:, 1] * d0
    return jnp.all(cross <= 1e-6, -1) | jnp.all(cross >= -1e-6, -1)


def _wheel_stripe(phase):
    """White rim quad of one wheel in wheel frame (car_dynamics.py:332-352).

    Returns (verts (4,2), active bool)."""
    a1, a2 = phase, phase + 1.2
    s1, s2 = jnp.sin(a1), jnp.sin(a2)
    c1, c2 = jnp.cos(a1), jnp.cos(a2)
    active = ~((s1 > 0) & (s2 > 0))
    c1 = jnp.where(s1 > 0, jnp.sign(c1), c1)
    c2 = jnp.where(s2 > 0, jnp.sign(c2), c2)
    w, r = C.WHEEL_W * C.SIZE, C.WHEEL_R * C.SIZE
    verts = jnp.stack([
        jnp.stack([-w, r * c1]), jnp.stack([+w, r * c1]),
        jnp.stack([+w, r * c2]), jnp.stack([-w, r * c2]),
    ])
    return verts, active


def _background(pw):
    """Grass checker / out-of-field white (car_racing.py:608-644 + GL clear)."""
    px, py = pw[..., 0], pw[..., 1]
    infield = (jnp.abs(px) <= PLAYFIELD) & (jnp.abs(py) <= PLAYFIELD)
    ix = jnp.floor(px / GRASS_K).astype(jnp.int32)
    iy = jnp.floor(py / GRASS_K).astype(jnp.int32)
    light = (ix % 2 == 0) & (iy % 2 == 0)
    grass = jnp.where(
        light[..., None], jnp.asarray(textures.GRASS_LIGHT),
        jnp.asarray(textures.GRASS_DARK),
    )
    return jnp.where(infield[..., None], grass, jnp.asarray(textures.OUTFIELD))


def _indicator_quads(car: CarState, hull_vel):
    """HUD bar quads in window coords (car_racing.py:713-773).

    Returns (quads (7, 4, 2), colors (7, 3))."""
    W, H = camera.WINDOW_W, camera.WINDOW_H
    s, h = W / 40.0, H / 40.0

    def vert(place, val, color):
        x0, x1 = place * s, (place + 1) * s
        y0, y1 = h, h + h * val
        q = jnp.stack([
            jnp.stack([x0, y1]), jnp.stack([x1, y1]),
            jnp.stack([x1, y0]), jnp.stack([x0, y0]),
        ])
        return q, jnp.asarray(color, F32)

    def horiz(place, val, color):
        x0 = place * s
        x1 = (place + val) * s
        q = jnp.stack([
            jnp.stack([x0, 4 * h]), jnp.stack([x1, 4 * h]),
            jnp.stack([x1, 2 * h]), jnp.stack([x0, 2 * h]),
        ])
        return q, jnp.asarray(color, F32)

    true_speed = jnp.linalg.norm(hull_vel)
    quads = [
        vert(5.0, 0.02 * true_speed, [1, 1, 1]),
        vert(7.0, 0.01 * car.omega[0], [0.0, 0, 1]),
        vert(8.0, 0.01 * car.omega[1], [0.0, 0, 1]),
        vert(9.0, 0.01 * car.omega[2], [0.2, 0, 1]),
        vert(10.0, 0.01 * car.omega[3], [0.2, 0, 1]),
        horiz(20.0, -10.0 * car.joint_angle[0], [0, 1, 0]),
        horiz(30.0, -0.8 * car.angular_vel, [1, 0, 0]),
    ]
    return jnp.stack([q for q, _ in quads]), jnp.stack([c for _, c in quads])


def _car_polys(car: CarState):
    """All car polygons in world frame, reference draw order
    (wheels+rims first, hull last). Returns (verts (13,8,2), colors (13,3),
    active (13,))."""
    hull_rot = _rot2(car.angle)
    hull_world = jnp.asarray(HULL_POLYS) @ hull_rot.T + car.pos  # (4,8,2)

    wheel_angle = car.angle + car.joint_angle                    # (4,)
    wc = jnp.cos(wheel_angle)[:, None]
    ws = jnp.sin(wheel_angle)[:, None]
    wheel_pos = car.pos + jnp.asarray(C.WHEEL_POSITIONS, F32) @ hull_rot.T

    def to_world(v_body, idx):
        x, y = v_body[..., 0], v_body[..., 1]
        return jnp.stack(
            [wc[idx] * x - ws[idx] * y, ws[idx] * x + wc[idx] * y], -1
        ) + wheel_pos[idx]

    wheel_world = jax.vmap(
        lambda i: to_world(jnp.asarray(WHEEL_POLY), i)
    )(jnp.arange(4))                                             # (4,8,2)

    stripes, stripe_active = jax.vmap(_wheel_stripe)(car.phase)  # (4,4,2),(4,)
    stripes = jnp.concatenate([stripes, stripes[:, -1:].repeat(MAXV - 4, 1)], 1)
    stripe_world = jax.vmap(to_world)(stripes, jnp.arange(4))    # (4,8,2)

    # order: wheel0, rim0, wheel1, rim1, ... then the 4 hull polys
    verts = jnp.concatenate([
        jnp.stack([wheel_world, stripe_world], 1).reshape(8, MAXV, 2),
        hull_world,
    ])
    colors = jnp.concatenate([
        jnp.tile(jnp.stack([jnp.asarray(WHEEL_COLOR), jnp.asarray(WHEEL_WHITE)]), (4, 1)),
        jnp.tile(jnp.asarray(HULL_COLOR)[None], (4, 1)),
    ])
    active = jnp.concatenate([
        jnp.stack([jnp.ones(4, bool), stripe_active], 1).reshape(8),
        jnp.ones(4, bool),
    ])
    return verts, colors, active


def render(
    car: CarState,
    geom: TrackGeometry,
    overlay: Optional[Overlay] = None,
):
    """Render one env. Returns (state, augmented): (96, 96, 3) uint8 each."""
    hull_vel = hull_com_velocity(car)
    angle = camera.camera_angle(car.angle, hull_vel)
    pw = camera.pixel_world_coords(car.pos, angle)          # (96,96,2) world
    win = camera.pixel_window_centers()                     # (96,96,2) window

    img = _background(pw)

    base_idx, lane_idx = _sample_texture_mxu(geom, pw)
    base_color = jnp.asarray(textures.BASE_PALETTE)[base_idx]
    img = jnp.where((base_idx > 0)[..., None], base_color, img)

    lane_color = jnp.asarray(textures.LANE_PALETTE)[lane_idx]
    img_augm = jnp.where((lane_idx > 0)[..., None], lane_color, img)

    # predicted-points overlay (red polylines, 1px, car_racing.py:691-701)
    if overlay is not None:
        a = overlay.points[:, :-1]                          # (K, L-1, 2)
        b = overlay.points[:, 1:]
        seg_ok = overlay.valid[:, None] & jnp.ones(a.shape[1], bool)
        a = a.reshape(-1, 2)
        b = b.reshape(-1, 2)
        seg_ok = seg_ok.reshape(-1)
        aw = camera.world_to_window(a, car.pos, angle) * jnp.asarray(
            [camera.STATE_W / camera.WINDOW_W, camera.STATE_H / camera.WINDOW_H])
        bw = camera.world_to_window(b, car.pos, angle) * jnp.asarray(
            [camera.STATE_W / camera.WINDOW_W, camera.STATE_H / camera.WINDOW_H])
        pf = win * jnp.asarray(
            [camera.STATE_W / camera.WINDOW_W, camera.STATE_H / camera.WINDOW_H])
        d = bw - aw                                          # (S, 2)
        l2 = jnp.maximum(jnp.sum(d * d, -1), 1e-9)
        ap = pf[:, :, None, :] - aw                          # (96,96,S,2)
        t = jnp.clip(jnp.sum(ap * d, -1) / l2, 0.0, 1.0)
        close = ap - t[..., None] * d
        dist2 = jnp.sum(close * close, -1)
        hit = jnp.any((dist2 <= 0.5**2) & seg_ok, -1)
        img = jnp.where(hit[..., None], jnp.asarray(POINTS_COLOR), img)
        img_augm = jnp.where(hit[..., None], jnp.asarray(POINTS_COLOR), img_augm)

    # car polygons (world frame)
    verts, colors, active = _car_polys(car)
    for i in range(verts.shape[0]):
        inside = _point_in_convex(pw, verts[i]) & active[i]
        img = jnp.where(inside[..., None], colors[i], img)
        img_augm = jnp.where(inside[..., None], colors[i], img_augm)

    # HUD in window coords: black bar + indicator quads
    hud_rows = win[..., 1] <= 5 * (camera.WINDOW_H / 40.0)
    img = jnp.where(hud_rows[..., None], 0.0, img)
    img_augm = jnp.where(hud_rows[..., None], 0.0, img_augm)
    quads, qcolors = _indicator_quads(car, hull_vel)
    for i in range(quads.shape[0]):
        inside = _point_in_convex(win, quads[i])
        img = jnp.where(inside[..., None], qcolors[i], img)
        img_augm = jnp.where(inside[..., None], qcolors[i], img_augm)

    to_u8 = lambda x: jnp.round(jnp.clip(x, 0, 1) * 255).astype(jnp.uint8)
    return to_u8(img), to_u8(img_augm)


render_batch = jax.vmap(render, in_axes=(0, 0, None))
