"""Pure-jnp 96x96 rasterizer for the CarRacing state image, laid out for TPU.

Replaces the reference's per-step double OpenGL rasterization + glReadPixels
readback (`/root/reference/envs/car_racing.py:498-599`) with a fused array
program.  Draw order matches the GL pass exactly: background -> road texture
-> [augmented: lanes] -> points buffer -> wheels (with white rims) -> hull ->
HUD.  vmap over envs for batched rendering.

TPU layout design
-----------------
Every per-pixel quantity lives on a flat ``(72, 128)`` float32/int32 *plane*
(9216 px = 96*96; 128 = exactly the VPU lane width, 72 = 9 full sublane
groups).  A naive ``(96, 96, 3)`` RGB layout puts the 3-channel dim on the
128-wide lane axis and wastes 125/128 of every vector op; here color only
materializes at the very end.  The pipeline is:

1. camera: world coords of each pixel as two planes (px, py);
2. every layer (grass checker, road texels, lanes, predicted-point overlay,
   12 car polygons, HUD bar + 7 indicator quads) becomes a boolean plane;
3. draw order = a single elementwise ``max`` over per-layer palette indices
   (later layers get larger indices, so "later draw wins" is just max);
4. colorization = one-hot(layer) @ uint8-palette — a (9216, 64) x (64, 3)
   bfloat16 matmul on the MXU whose accumulation is exact (one 1 per row,
   integer-valued palette), so output bytes match the f32 reference math
   bit-for-bit.

Texel fetch is also MXU-shaped (`_sample_texture_mxu`): TPU has no efficient
per-lane gather, so nearest-neighbor sampling is a one-hot row gather matmul
over a 128x128 window of the packed track texture dynamic-sliced around the
viewport (the 96x96 viewport spans at most ~122 texels at the fixed zoom).

The pyglet score label (bottom-left "%04i" text, car_racing.py:504-512,774)
is rasterized as a 7-segment approximation at the label's exact window
position/size (font_size 36 at x=20, y=50): pyglet's GL font atlas is not
reproducible without the font file, but the digits land on the same pixels
with the same color. Pass `score=None` to omit it.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import CarState, constants as C, hull_com_velocity
from ..track.generator import PLAYFIELD
from ..track.geometry import TrackGeometry
from ..track import texture as textures
from . import camera

F32 = jnp.float32
FLAT = (72, 128)  # 9216 = 96 * 96 pixels as full (sublane, lane) tiles

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

# Static flat-plane row bands (see FLAT below: each flat row = 128
# consecutive pixels = 1 1/3 image rows).  The camera is car-locked: the
# hull origin always projects to image (row 71.5, col 48) and every car
# vertex lies within 2.87 world units of it (hull 2.86, wheels 2.58) =
# 5.6 px vertically at the fixed zoom, so the car can only touch image
# rows [66, 78]; we test its polygons on image rows [60, 84) only (flat
# rows 45..63, 4x fewer pixels, bit-identical frames).  The HUD bar covers
# wy <= 100 (image rows >= 84) and its indicator quads stay below
# wy = 240 for any physically reachable speed/omega (bar value <= 11 <->
# |true_speed| <= 550 m/s); image rows [66.7, 96) = flat rows 50..72.
CAR_ROWS = (45, 63)
HUD_ROWS = (50, 72)
# score label: font_size 36 anchored (left, center) at window (20, 50)
# (car_racing.py:504-512) -> glyphs span wy in [37.5, 62.5], image rows
# 88..91; with subsample extents that is flat rows 65..69
SCORE_ROWS = (65, 70)

# HUD indicator colors in draw order (car_racing.py:713-773)
HUD_COLORS = np.array([
    [1.0, 1.0, 1.0],    # true speed
    [0.0, 0.0, 1.0],    # wheel omega 0
    [0.0, 0.0, 1.0],    # wheel omega 1
    [0.2, 0.0, 1.0],    # wheel omega 2
    [0.2, 0.0, 1.0],    # wheel omega 3
    [0.0, 1.0, 0.0],    # steering joint angle
    [1.0, 0.0, 0.0],    # angular velocity
], np.float32)

# ---------------------------------------------------------------------------
# unified layer palette: index = draw order; composition = elementwise max
# ---------------------------------------------------------------------------
L_OUTFIELD = 0
L_GRASS_DARK = 1
L_GRASS_LIGHT = 2
L_BASE0 = 3          # 3..7: road shades / borders (texture base 1..5)
L_LANE0 = 8          # 8..12: behavior lanes (texture lane 1..5, augm only)
N_LANES = 5
L_POINTS = 13
L_CAR0 = 14          # 14..25: wheel0, rim0, ..., hull1..4 in draw order
L_HUD_BAR = 26
L_HUD0 = 27          # 27..33: indicator quads
L_SCORE = 34         # score digits (drawn last, car_racing.py:774-775)
N_LAYERS = 64        # palette rows (padded for the one-hot matmul)


def _u8(c):
    """Exact uint8 palette entry: same rounding as the f32 renderer's
    jnp.round(clip(c, 0, 1) * 255) (round-half-even)."""
    c = np.clip(np.asarray(c, np.float32), 0, 1) * np.float32(255)
    return np.round(c).astype(np.uint8)


def _build_palette() -> np.ndarray:
    pal = np.zeros((N_LAYERS, 3), np.uint8)
    pal[L_OUTFIELD] = _u8(textures.OUTFIELD)
    pal[L_GRASS_DARK] = _u8(textures.GRASS_DARK)
    pal[L_GRASS_LIGHT] = _u8(textures.GRASS_LIGHT)
    pal[L_BASE0:L_BASE0 + 5] = _u8(textures.BASE_PALETTE[1:6])
    pal[L_LANE0:L_LANE0 + 5] = _u8(textures.LANE_PALETTE[1:6])
    pal[L_POINTS] = _u8(POINTS_COLOR)
    for k in range(4):
        pal[L_CAR0 + 2 * k] = _u8(WHEEL_COLOR)
        pal[L_CAR0 + 2 * k + 1] = _u8(WHEEL_WHITE)
    pal[L_CAR0 + 8:L_CAR0 + 12] = _u8(HULL_COLOR)
    pal[L_HUD_BAR] = 0
    pal[L_HUD0:L_HUD0 + 7] = _u8(HUD_COLORS)
    pal[L_SCORE] = 255                      # white, car_racing.py:511
    return pal


PALETTE_U8 = _build_palette()


class Overlay(NamedTuple):
    """Predicted-trajectory polylines (the `add_points2Buffer` hook,
    car_racing.py:704-710): world-frame line strips drawn in red."""

    points: jax.Array   # (K, L, 2)
    valid: jax.Array    # (K,) bool


def _rot2(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def _pixel_planes():
    """Constant planes (XLA folds them at compile time): logical-window
    coords (wx, wy) of every pixel, pre-divided camera-frame coords
    (rx, ry), all (72, 128) f32.  Math mirrors camera.pixel_window_centers /
    window_to_world exactly."""
    i0 = jax.lax.broadcasted_iota(jnp.int32, FLAT, 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, FLAT, 1)
    p = i0 * 128 + i1
    r = p // camera.STATE_W
    c = p % camera.STATE_W
    wx = (c + 0.5) * (camera.WINDOW_W / camera.STATE_W)
    wy = (camera.STATE_H - 1 - r + 0.5) * (camera.WINDOW_H / camera.STATE_H)
    rx = (wx - camera.WINDOW_W / 2) / camera.CAM_ZOOM
    ry = (wy - camera.WINDOW_H / 4) / camera.CAM_ZOOM
    return wx, wy, rx, ry


WINDOW = 128  # texture window size (texels); the 96x96 viewport spans at
# most ~122 texels diagonally at the fixed zoom, so a 128-window centered on
# the visible region always covers every in-field pixel.


def _sample_texture_mxu(geom: TrackGeometry, px: jax.Array, py: jax.Array):
    """Palette lookup via MXU one-hot matmuls instead of a random gather.

    TPU has no efficient per-lane gather: XLA lowers the naive
    `tex[i, j]` to a scalar loop (~200us/frame measured). Instead we
    dynamic-slice a 128x128 window of the packed texture around the viewport
    (contiguous DMA) and evaluate
    sample[p] = sum_ij onehotI[p,i] * V[i,j] * onehotJ[p,j] as a
    (9216,128)@(128,128) matmul plus an elementwise reduction — exact
    nearest-neighbor sampling on the systolic array.

    px, py: (72, 128) world-coord planes. Returns (base_idx, lane_idx) int32
    planes (0 outside the playfield).
    """
    tex_size = geom.tex.shape[0]
    s = tex_size / (2.0 * PLAYFIELD)
    fx = (px + PLAYFIELD) * s                     # float texel coords
    fy = (py + PLAYFIELD) * s
    fi = jnp.floor(fx).astype(jnp.int32)
    fj = jnp.floor(fy).astype(jnp.int32)
    infield = (fx >= 0) & (fx < tex_size) & (fy >= 0) & (fy < tex_size)

    big = jnp.int32(10 * tex_size)
    oi = jnp.clip(jnp.min(jnp.where(infield, fi, big)), 0, tex_size - WINDOW)
    oj = jnp.clip(jnp.min(jnp.where(infield, fj, big)), 0, tex_size - WINDOW)

    win = jax.lax.dynamic_slice(geom.tex, (oi, oj), (WINDOW, WINDOW))
    packed = win.astype(jnp.bfloat16)             # values < 48: exact

    li = (fi - oi).reshape(-1)                    # (9216,) window-local rows
    lj = (fj - oj).reshape(-1)
    iw = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW), 1)
    onehot_i = (li[:, None] == iw).astype(jnp.bfloat16)
    onehot_j = (lj[:, None] == iw).astype(jnp.bfloat16)

    rows = jnp.dot(onehot_i, packed,
                   preferred_element_type=jnp.float32)   # (9216, 128)
    vals = jnp.sum(rows * onehot_j.astype(jnp.float32), axis=-1)
    vals = jnp.round(vals).astype(jnp.int32).reshape(FLAT)
    vals = jnp.where(infield, vals, 0)
    return vals // 8, vals % 8


def _poly_layers(px, py, verts, active, layer0,
                 counts=None, winding=None):
    """Fold convex polygons into a layer-index plane by draw order.

    verts: (N, MAXV, 2) world-frame; active: (N,) bool; polygon i gets
    palette index layer0 + i.  The inside test is the reference renderer's
    epsilon cross-product test per edge.

    counts: static per-poly vertex counts (padding vertices are degenerate
    repeats whose zero edges always pass — skipping them halves the VPU
    work).  winding: per-poly 'cw' / 'ccw' / 'both' — rigid transforms
    preserve orientation, so statically-wound polys need only one of the
    two winding reductions ('both' is only needed for the wheel rims, whose
    quad flips orientation with the rotation phase).
    Returns an int32 plane (0 where no polygon covers the pixel).
    """
    n, nv = verts.shape[0], verts.shape[1]
    counts = counts or (nv,) * n
    winding = winding or ("both",) * n
    layer = jnp.zeros(px.shape, jnp.int32)
    for i in range(n):
        cmax = None
        cmin = None
        want_max = winding[i] in ("cw", "both")
        want_min = winding[i] in ("ccw", "both")
        for e in range(counts[i]):
            ax = verts[i, e, 0]
            ay = verts[i, e, 1]
            e0 = verts[i, (e + 1) % counts[i], 0] - ax
            e1 = verts[i, (e + 1) % counts[i], 1] - ay
            cross = e0 * (py - ay) - e1 * (px - ax)
            if want_max:
                cmax = cross if cmax is None else jnp.maximum(cmax, cross)
            if want_min:
                cmin = cross if cmin is None else jnp.minimum(cmin, cross)
        if winding[i] == "cw":
            inside = cmax <= 1e-6
        elif winding[i] == "ccw":
            inside = cmin >= -1e-6
        else:
            inside = (cmax <= 1e-6) | (cmin >= -1e-6)
        layer = jnp.where(inside & active[i], jnp.int32(layer0 + i), layer)
    return layer


# car polygon metadata (draw order wheel0, rim0, ..., hull1..4): vertex
# counts and orientations of the static tables above. The rims ('both')
# flip winding with the rotation phase.
CAR_COUNTS = (4, 4) * 4 + tuple(
    len(p) for p in (C.HULL_POLY1, C.HULL_POLY2, C.HULL_POLY3, C.HULL_POLY4))
CAR_WINDING = ("cw", "both") * 4 + ("cw", "cw", "cw", "ccw")


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


def _background_layer(px, py):
    """Grass checker / out-of-field white (car_racing.py:608-644 + GL clear)
    as palette indices."""
    infield = (jnp.abs(px) <= PLAYFIELD) & (jnp.abs(py) <= PLAYFIELD)
    ix = jnp.floor(px / GRASS_K).astype(jnp.int32)
    iy = jnp.floor(py / GRASS_K).astype(jnp.int32)
    light = (ix % 2 == 0) & (iy % 2 == 0)
    grass = jnp.where(light, jnp.int32(L_GRASS_LIGHT), jnp.int32(L_GRASS_DARK))
    return jnp.where(infield, grass, jnp.int32(L_OUTFIELD))


def _indicator_quads(car: CarState, hull_vel):
    """HUD bar quads in window coords (car_racing.py:713-773).

    Returns quads (7, 4, 2); colors are the static HUD_COLORS."""
    W, H = camera.WINDOW_W, camera.WINDOW_H
    s, h = W / 40.0, H / 40.0

    def vert(place, val):
        x0, x1 = place * s, (place + 1) * s
        y0, y1 = h, h + h * val
        return jnp.stack([
            jnp.stack([x0, y1]), jnp.stack([x1, y1]),
            jnp.stack([x1, y0]), jnp.stack([x0, y0]),
        ])

    def horiz(place, val):
        x0 = place * s
        x1 = (place + val) * s
        return jnp.stack([
            jnp.stack([x0, 4 * h]), jnp.stack([x1, 4 * h]),
            jnp.stack([x1, 2 * h]), jnp.stack([x0, 2 * h]),
        ])

    true_speed = jnp.linalg.norm(hull_vel)
    return jnp.stack([
        vert(5.0, 0.02 * true_speed),
        vert(7.0, 0.01 * car.omega[0]),
        vert(8.0, 0.01 * car.omega[1]),
        vert(9.0, 0.01 * car.omega[2]),
        vert(10.0, 0.01 * car.omega[3]),
        horiz(20.0, -10.0 * car.joint_angle[0]),
        horiz(30.0, -0.8 * car.angular_vel),
    ])


# 7-segment glyph geometry (window px inside a 16x25 digit cell; the label
# is font_size 36 -> ~25 px cap height, ~20 px advance).  Segment rects as
# (u0, u1, v0, v1); segment order: top, top-right, bottom-right, bottom,
# bottom-left, top-left, middle.
_SCORE_X0, _SCORE_ADV, _SCORE_Y0 = 20.0, 20.0, 37.5
_SEG_T = 4.5
_SEG_RECTS = np.array([
    (1.0, 15.0, 25.0 - _SEG_T, 25.0),            # top
    (16.0 - _SEG_T, 16.0, 12.5, 25.0),           # top-right
    (16.0 - _SEG_T, 16.0, 0.0, 12.5),            # bottom-right
    (1.0, 15.0, 0.0, _SEG_T),                    # bottom
    (0.0, _SEG_T, 0.0, 12.5),                    # bottom-left
    (0.0, _SEG_T, 12.5, 25.0),                   # top-left
    (1.0, 15.0, 12.5 - _SEG_T / 2, 12.5 + _SEG_T / 2),  # middle
], np.float32)
# per-char segment bitmasks: digits 0-9 then '-' (index 10)
_SEG_BITS = np.array([63, 6, 91, 79, 102, 109, 125, 7, 127, 111, 64],
                     np.int32)


def _score_chars(score: jax.Array) -> jax.Array:
    """The 4 glyphs of `"%04i" % score` (digit value, or 10 for '-')."""
    val = jnp.trunc(score).astype(jnp.int32)       # C %i truncates toward 0
    a = jnp.abs(val)
    d = jnp.stack([(a // 1000) % 10, (a // 100) % 10, (a // 10) % 10, a % 10])
    return jnp.where(val < 0, jnp.concatenate([jnp.full((1,), 10), d[1:]]), d)


def _score_coverage_table() -> np.ndarray:
    """(4 slots, 11 glyphs, band_rows, 128) uint8 subsample-hit counts.

    The label geometry is static (fixed window position/size), so the 4x4
    subsample coverage of every (slot, glyph, pixel) is a compile-time
    constant; at render time only the 4 digit values select rows of this
    table. Same math as the previous in-graph evaluation, in f32."""
    i0, i1 = SCORE_ROWS
    p = np.arange(i0 * 128, i1 * 128)
    r = (p // camera.STATE_W).astype(np.float32)
    c = (p % camera.STATE_W).astype(np.float32)
    wx = (c + 0.5) * np.float32(camera.WINDOW_W / camera.STATE_W)
    wy = (camera.STATE_H - 1 - r + 0.5) * np.float32(
        camera.WINDOW_H / camera.STATE_H)
    offs = ((np.arange(4, dtype=np.float32) + 0.5) / 4.0 - 0.5)
    sx = wx[None] + (np.repeat(offs, 4)[:, None]
                     * np.float32(camera.WINDOW_W / camera.STATE_W))
    sy = wy[None] + (np.tile(offs, 4)[:, None]
                     * np.float32(camera.WINDOW_H / camera.STATE_H))
    gx = sx - np.float32(_SCORE_X0)
    slot = np.floor(gx / np.float32(_SCORE_ADV)).astype(np.int32)
    u = gx - slot.astype(np.float32) * np.float32(_SCORE_ADV)
    v = sy - np.float32(_SCORE_Y0)
    table = np.zeros((4, 11, len(p)), np.uint8)
    for s in range(4):
        for ch in range(11):
            bits = int(_SEG_BITS[ch])
            inside = np.zeros_like(sx, bool)
            for j, (u0, u1, v0, v1) in enumerate(_SEG_RECTS):
                if (bits >> j) & 1:
                    inside |= ((u >= u0) & (u <= u1) & (v >= v0) & (v <= v1))
            inside &= slot == s
            table[s, ch] = inside.sum(0)
    return table.reshape(4, 11, i1 - i0, 128)


_SCORE_COVER = _score_coverage_table()

# Pre-thresholded layer-value table padded to the HUD row band: slots are
# column-disjoint (slot = floor(gx/adv)), so thresholding each (slot, glyph)
# plane at coverage >= 4 commutes with the sum over slots — the one-hot
# matmul then yields the final {0, L_SCORE} values directly, and maxing into
# the HUD band costs no extra dynamic-update-slice (measured: the padded
# (44, 22*128) table benches ~1k steps/s faster than a (44, 5*128) table
# plus a sub-slice update).
def _score_value_table() -> np.ndarray:
    h0, h1 = HUD_ROWS
    s0, s1 = SCORE_ROWS
    t = np.zeros((4, 11, h1 - h0, 128), np.uint8)
    t[:, :, s0 - h0:s1 - h0] = (_SCORE_COVER >= 4) * np.uint8(L_SCORE)
    return t


_SCORE_VALUES = _score_value_table()

# tight bounding box of every pixel any glyph can light, within the HUD
# band: the label occupies a fixed ~(rows x cols) corner, so the one-hot
# contraction only needs that sub-block (22x fewer dot outputs than the
# full band) and the result maxes into the band with a static slice.
_SCORE_LIT_R = np.nonzero(_SCORE_VALUES.any(axis=(0, 1, 3)))[0]
_SCORE_LIT_C = np.nonzero(_SCORE_VALUES.any(axis=(0, 1, 2)))[0]
_SR0, _SR1 = int(_SCORE_LIT_R.min()), int(_SCORE_LIT_R.max()) + 1
_SC0, _SC1 = int(_SCORE_LIT_C.min()), int(_SCORE_LIT_C.max()) + 1
_SCORE_BLOCK = _SCORE_VALUES[:, :, _SR0:_SR1, _SC0:_SC1]


def _score_block(score: jax.Array) -> jax.Array:
    """Score digits as a (rows, cols) layer sub-block (HUD-band-relative
    rows [_SR0,_SR1), cols [_SC0,_SC1)).

    Binary approximation of the GL alpha-blended label: 4x4 subsample
    coverage per pixel, lit where coverage >= 0.25 (strokes are ~0.4-0.5 of
    a 96x96 pixel wide, so antialiased gray in GL becomes solid white here).
    Runtime work is ONE tiny matmul: a (4,11) one-hot of the glyph values
    contracted against the pre-thresholded value table, trimmed to the
    label's lit bounding box — under vmap the whole env batch becomes a
    single (B,44)@(44,rows*cols) MXU dot (the round-2 version did 44
    per-plane selects over the full band per env per frame, which cost
    ~2.6% of env+render throughput). int8 is exact here: table entries are
    0 or L_SCORE and at most one slot lights a pixel.
    """
    chars = _score_chars(score)                              # (4,) int32
    onehot = (chars[:, None] == jnp.arange(11)[None, :])     # (4, 11)
    table = jnp.asarray(
        _SCORE_BLOCK.reshape(44, -1), jnp.int8)              # (44, r*c)
    vals = jnp.dot(onehot.reshape(1, 44).astype(jnp.int8), table,
                   preferred_element_type=jnp.int32)         # (1, r*c)
    return vals.reshape(_SCORE_BLOCK.shape[2:])


def _score_band(score: jax.Array) -> jax.Array:
    """Round-2 formulation: one dot over the FULL zero-padded HUD band
    (44 x 22*128).  More dot outputs than `_score_block`, but the result
    maxes into the band with a plain elementwise `maximum` instead of a
    sub-slice update — which of the two wins is layout-dependent; both are
    kept and selected by SPDM_SCORE_PATH (bit-identical output)."""
    chars = _score_chars(score)
    onehot = (chars[:, None] == jnp.arange(11)[None, :])
    table = jnp.asarray(_SCORE_VALUES.reshape(44, -1), jnp.int8)
    vals = jnp.dot(onehot.reshape(1, 44).astype(jnp.int8), table,
                   preferred_element_type=jnp.int32)
    return vals.reshape(_SCORE_VALUES.shape[2:])


def _score_layer(score: jax.Array) -> jax.Array:
    """Full HUD-band score layer (tests/A-B: zero-padded block)."""
    h0, h1 = HUD_ROWS
    out = jnp.zeros((h1 - h0, 128), jnp.int32)
    return out.at[_SR0:_SR1, _SC0:_SC1].set(_score_block(score))


def _hud_layer(wx, wy, car: CarState, hull_vel):
    """HUD bar + indicator quads as a layer plane.  The quads are all
    axis-aligned rectangles in window coords (car_racing.py:713-773), so the
    inside test is four compares instead of per-edge cross products."""
    quads = _indicator_quads(car, hull_vel)            # (7, 4, 2)
    xs, ys = quads[..., 0], quads[..., 1]
    x0, x1 = jnp.min(xs, -1), jnp.max(xs, -1)          # (7,)
    y0, y1 = jnp.min(ys, -1), jnp.max(ys, -1)
    layer = jnp.where(wy <= 5 * (camera.WINDOW_H / 40.0),
                      jnp.int32(L_HUD_BAR), 0)
    for i in range(quads.shape[0]):
        inside = ((wx >= x0[i]) & (wx <= x1[i]) &
                  (wy >= y0[i]) & (wy <= y1[i]))
        layer = jnp.where(inside, jnp.int32(L_HUD0 + i), layer)
    return layer


def _car_polys(car: CarState):
    """All car polygons in world frame, reference draw order
    (wheels+rims first, hull last). Returns (verts (12,8,2), active (12,))."""
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
    active = jnp.concatenate([
        jnp.stack([jnp.ones(4, bool), stripe_active], 1).reshape(8),
        jnp.ones(4, bool),
    ])
    return verts, active


def _overlay_layer(overlay: Overlay, wx, wy, scroll, angle):
    """Predicted-points polylines as a layer plane (car_racing.py:691-701):
    red 1px-wide segments in state-pixel space."""
    a = overlay.points[:, :-1]                          # (K, L-1, 2)
    b = overlay.points[:, 1:]
    seg_ok = overlay.valid[:, None] & jnp.ones(a.shape[1], bool)
    a = a.reshape(-1, 2)
    b = b.reshape(-1, 2)
    seg_ok = seg_ok.reshape(-1)
    sx = jnp.asarray(camera.STATE_W / camera.WINDOW_W, F32)
    sy = jnp.asarray(camera.STATE_H / camera.WINDOW_H, F32)
    aw = camera.world_to_window(a, scroll, angle)       # (S, 2)
    bw = camera.world_to_window(b, scroll, angle)
    awx, awy = aw[:, 0] * sx, aw[:, 1] * sy
    bwx, bwy = bw[:, 0] * sx, bw[:, 1] * sy
    pfx, pfy = wx * sx, wy * sy                         # pixel planes

    # Segments are processed in fixed CHUNK-sized batches under one lax.scan:
    # compile time stays O(1) in the segment count (the reference buffer
    # holds up to 100 polylines, car_racing.py:704-710 — a python unroll of
    # K*(L-1) plane ops would blow up the compile), while each chunk is
    # fully vectorized (CHUNK, 72, 128) on the VPU.
    CHUNK = 32
    S = a.shape[0]
    pad = (-S) % CHUNK
    if pad:
        zf = jnp.zeros(pad, F32)
        awx, awy, bwx, bwy = (jnp.concatenate([v, zf])
                              for v in (awx, awy, bwx, bwy))
        seg_ok = jnp.concatenate([seg_ok, jnp.zeros(pad, bool)])
    n_chunks = (S + pad) // CHUNK

    def body(hit, c):
        ax, ay, bx, by, ok = c                              # (CHUNK,)
        dx = (bx - ax)[:, None, None]
        dy = (by - ay)[:, None, None]
        l2 = jnp.maximum(dx * dx + dy * dy, 1e-9)
        apx = pfx[None] - ax[:, None, None]                 # (CHUNK, 72, 128)
        apy = pfy[None] - ay[:, None, None]
        t = jnp.clip((apx * dx + apy * dy) / l2, 0.0, 1.0)
        cx = apx - t * dx
        cy = apy - t * dy
        dist2 = cx * cx + cy * cy
        near = (dist2 <= 0.5 ** 2) & ok[:, None, None]
        return hit | jnp.any(near, axis=0), None

    chunks = tuple(v.reshape(n_chunks, CHUNK)
                   for v in (awx, awy, bwx, bwy, seg_ok))
    hit, _ = jax.lax.scan(body, jnp.zeros(FLAT, bool), chunks)
    return jnp.where(hit, jnp.int32(L_POINTS), 0)


def _colorize_matmul(layer: jax.Array) -> jax.Array:
    """(72,128) int32 layer plane -> (96,96,3) uint8 via a one-hot palette
    matmul (exact: one 1 per row, integer-valued bf16 palette)."""
    iw = jax.lax.broadcasted_iota(jnp.int32, (1, N_LAYERS), 1)
    onehot = (layer.reshape(-1, 1) == iw).astype(jnp.bfloat16)
    rgb = jnp.dot(onehot, jnp.asarray(PALETTE_U8, jnp.bfloat16),
                  preferred_element_type=jnp.float32)   # (9216, 3) exact ints
    return rgb.astype(jnp.uint8).reshape(camera.STATE_H, camera.STATE_W, 3)


def _palette_runs():
    """Maximal contiguous [lo, hi] index runs of equal packed palette color
    over the reachable layer range (compile-time constant).

    Lane indices L_LANE0..+4 never reach `_colorize` — the state-frame layer
    plane excludes lanes (the augmented frame colorizes them by select in
    `_compose`) — so they are dropped from the runs, but correctness does not
    depend on that: they'd just add selects."""
    pal = PALETTE_U8.astype(np.int32)
    packed = (pal[:, 0] << 16) | (pal[:, 1] << 8) | pal[:, 2]
    reach = [k for k in range(L_SCORE + 1)
             if not (L_LANE0 <= k < L_LANE0 + N_LANES)]
    runs = []
    i = 0
    while i < len(reach):
        j = i
        while (j + 1 < len(reach) and reach[j + 1] == reach[j] + 1
               and packed[reach[j + 1]] == packed[reach[i]]):
            j += 1
        runs.append((reach[i], reach[j], int(packed[reach[i]])))
        i = j + 1
    return tuple(runs)


_PAL_RUNS = _palette_runs()


def _colorize_select(layer: jax.Array) -> jax.Array:
    """(72,128) int32 layer plane -> (96,96,3) uint8 via a fused select
    chain over a packed-RGB table (bit-identical to `_colorize_matmul`).

    The matmul path builds a (9216, 64) bf16 one-hot per frame — ~1.2 MB
    that XLA materializes as the dot's LHS (the same patches-tensor tax the
    im2col convs paid, BASELINE.md).  Here the palette lookup is a chain of
    range-compare selects on an int32 packed-RGB plane; XLA fuses the whole
    chain into one elementwise kernel, so per-frame HBM traffic drops to
    read-layer + write-RGB with no MXU dispatch.  All ops are integer —
    exactness is structural."""
    packed = jnp.zeros(layer.shape, jnp.int32)
    for lo, hi, val in _PAL_RUNS:
        if val == 0:
            continue                     # the zero init already covers it
        if lo == hi:
            inside = layer == lo
        else:
            inside = (layer >= lo) & (layer <= hi)
        packed = jnp.where(inside, jnp.int32(val), packed)
    flat = packed.reshape(-1)
    rgb = jnp.stack([(flat >> 16) & 255, (flat >> 8) & 255, flat & 255],
                    axis=-1).astype(jnp.uint8)
    return rgb.reshape(camera.STATE_H, camera.STATE_W, 3)


def _colorize(layer: jax.Array) -> jax.Array:
    if os.environ.get("SPDM_COLORIZE_PATH", "matmul") == "matmul":
        return _colorize_matmul(layer)
    return _colorize_select(layer)


def _compose(
    car: CarState,
    base_idx: jax.Array,
    lane_idx: jax.Array,
    overlay: Optional[Overlay] = None,
    score: Optional[jax.Array] = None,
):
    """Everything after texel sampling: layer composition + colorization."""
    hull_vel = hull_com_velocity(car)
    angle = camera.camera_angle(car.angle, hull_vel)
    wx, wy, rx, ry = _pixel_planes()
    c, s = jnp.cos(angle), jnp.sin(angle)
    px = c * rx + s * ry + car.pos[0]                   # world-coord planes
    py = -s * rx + c * ry + car.pos[1]

    layer = _background_layer(px, py)
    layer = jnp.maximum(layer, jnp.where(base_idx > 0, base_idx + (L_BASE0 - 1), 0))
    lane_term = jnp.where(lane_idx > 0, lane_idx + (L_LANE0 - 1), 0)

    if overlay is not None:
        layer = jnp.maximum(layer, _overlay_layer(overlay, wx, wy, car.pos, angle))

    # car polygons: tested only on the static flat-row band the car-locked
    # camera can place them in (CAR_ROWS above) — identical output, 4x less
    # per-pixel work
    verts, active = _car_polys(car)
    c0, c1 = CAR_ROWS
    car_band = _poly_layers(px[c0:c1], py[c0:c1], verts, active, L_CAR0,
                            CAR_COUNTS, CAR_WINDING)
    layer = layer.at[c0:c1].set(jnp.maximum(layer[c0:c1], car_band))

    # HUD: black bar over the bottom 5/40 of the window + indicator quads,
    # likewise restricted to its static row band
    h0, h1 = HUD_ROWS
    hud_band = _hud_layer(wx[h0:h1], wy[h0:h1], car, hull_vel)
    # score digits (drawn last in the reference, car_racing.py:774-775) live
    # inside the HUD band — max the trimmed glyph block into its static
    # sub-slice before the single band update (SPDM_SCORE_PATH=band keeps
    # the round-2 full-band dot + plain maximum for A/B)
    if score is not None:
        path = os.environ.get("SPDM_SCORE_PATH", "pad")
        if path == "band":
            hud_band = jnp.maximum(hud_band, _score_band(score))
        elif path == "pad":
            # default (measured 248.7k steps/s at 1024 envs, vs 248.4k for
            # the full-band dot and 226.3k for a sub-slice .at[].max): the
            # 9x-smaller dot, zero-padded statically so it fuses into the
            # plain elementwise maximum — band updates via dynamic slices
            # cost far more than the dot they save
            blk = _score_block(score)
            h0, h1 = HUD_ROWS
            full = jnp.pad(blk, ((_SR0, (h1 - h0) - _SR1),
                                 (_SC0, 128 - _SC1)))
            hud_band = jnp.maximum(hud_band, full)
        else:
            blk = _score_block(score)
            hud_band = hud_band.at[_SR0:_SR1, _SC0:_SC1].max(blk)
    layer = layer.at[h0:h1].set(jnp.maximum(layer[h0:h1], hud_band))

    # lanes sit above road/grass but below points/car/HUD: exactly max order.
    # The augmented frame differs from the state frame only where a lane
    # index wins the max, and lanes take just 5 palette entries — so instead
    # of a second full one-hot colorize, select the lane colors into the
    # state RGB (exact: where lane_term <= layer both frames colorize the
    # same index).
    state_rgb = _colorize(layer)
    lane_wins = (lane_term > layer).reshape(-1, 1)
    flat_lane = lane_term.reshape(-1, 1)
    lane_rgb = jnp.zeros_like(state_rgb).reshape(-1, 3)
    for k in range(N_LANES):
        li = L_LANE0 + k
        lane_rgb = jnp.where(flat_lane == li,
                             jnp.asarray(PALETTE_U8[li], jnp.uint8), lane_rgb)
    augm_rgb = jnp.where(lane_wins, lane_rgb,
                         state_rgb.reshape(-1, 3)).reshape(state_rgb.shape)
    return state_rgb, augm_rgb


def render(
    car: CarState,
    geom: TrackGeometry,
    overlay: Optional[Overlay] = None,
    score: Optional[jax.Array] = None,
):
    """Render one env. Returns (state, augmented): (96, 96, 3) uint8 each."""
    hull_vel = hull_com_velocity(car)
    angle = camera.camera_angle(car.angle, hull_vel)
    _, _, rx, ry = _pixel_planes()
    c, s = jnp.cos(angle), jnp.sin(angle)
    px = c * rx + s * ry + car.pos[0]
    py = -s * rx + c * ry + car.pos[1]
    base_idx, lane_idx = _sample_texture_mxu(geom, px, py)
    return _compose(car, base_idx, lane_idx, overlay, score)


def render_batch(cars: CarState, geoms: TrackGeometry,
                 overlay: Optional[Overlay] = None,
                 score: Optional[jax.Array] = None):
    return jax.vmap(render, in_axes=(0, 0, None,
                                     None if score is None else 0)
                    )(cars, geoms, overlay, score)


def render_batch_banked(
    cars: CarState,
    tex_bank: jax.Array,
    track_ids: jax.Array,
    overlay: Optional[Overlay] = None,
    score: Optional[jax.Array] = None,
):
    """Batched render against a bank of track textures (TPU fast path).

    Texel sampling runs as one Pallas kernel over the whole batch (window
    DMA + one-hot matmuls fused in VMEM, see render/pallas_sampler.py);
    composition stays vmapped XLA.  cars batched (B, ...); tex_bank
    (U, T, T) uint8; track_ids (B,).
    """
    from . import pallas_sampler

    hull_vel = jax.vmap(hull_com_velocity)(cars)
    angle = jax.vmap(camera.camera_angle)(cars.angle, hull_vel)
    c, s = jnp.cos(angle), jnp.sin(angle)
    _, _, rx, ry = _pixel_planes()
    vals = pallas_sampler.sample_banked(
        tex_bank, track_ids, c, s, cars.pos, rx, ry)
    base_idx, lane_idx = vals // 8, vals % 8
    if score is None:
        return jax.vmap(lambda car, b, l: _compose(car, b, l, overlay))(
            cars, base_idx, lane_idx)
    return jax.vmap(lambda car, b, l, sc: _compose(car, b, l, overlay, sc))(
        cars, base_idx, lane_idx, score)
