"""Device-side track geometry: a padded pytree + vectorized spatial queries.

Replaces the Box2D sensor-tile machinery (`FrictionDetector`,
`/root/reference/envs/car_racing.py:89-126`) with closed-form
nearest-centerline-segment math: tile membership, per-wheel friction limits
and the visited-tile reward all derive from one masked argmin over the padded
segment array.  Everything vmaps over a batch of envs and lives in HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import texture
from .generator import PLAYFIELD, TRACK_WIDTH, Track


class TrackGeometry(NamedTuple):
    """Per-track device arrays (stack leading axis for a batch of envs)."""

    seg_a: jax.Array        # (P, 2) segment/tile start points (= xy[(i-1)%n])
    seg_b: jax.Array        # (P, 2) segment/tile end points   (= xy[i])
    beta: jax.Array         # (P,) centerline heading at point i
    valid: jax.Array        # (P,) bool, i < n
    n: jax.Array            # () int32 number of tiles
    start: jax.Array        # (3,) car start (angle, x, y)
    tex: jax.Array          # (T, T) uint8 packed palette texture:
                            #   base_idx * 8 + lane_idx (both < 8).
                            # Packed single-plane storage keeps the per-step
                            # window slice a well-tiled 2-D uint8 DMA instead
                            # of a (T, T, 2) array whose last dim of 2 wastes
                            # 126/128 TPU lanes.


def build(track: Track, tex_size: int = texture.DEFAULT_TEX,
          bake: bool = True) -> TrackGeometry:
    """Build device geometry from a host-generated Track."""
    n = track.n
    xy = track.xy.copy()
    # valid wraparound for segment starts; padded tail repeats the last point
    prev = np.zeros_like(xy)
    prev[:n] = np.roll(xy[:n], 1, axis=0)
    prev[n:] = xy[max(n - 1, 0)]
    xy[n:] = xy[max(n - 1, 0)]
    if bake:
        t2 = texture.bake_texture(track, tex_size)
        tex = (t2[..., 0] * np.uint8(8) + t2[..., 1]).astype(np.uint8)
    else:
        tex = np.zeros((tex_size, tex_size), np.uint8)
    return TrackGeometry(
        seg_a=jnp.asarray(prev),
        seg_b=jnp.asarray(xy),
        beta=jnp.asarray(track.beta),
        valid=jnp.asarray(track.valid),
        n=jnp.asarray(track.n, jnp.int32),
        start=jnp.asarray(track.start),
        tex=jnp.asarray(tex),
    )


def stack(tracks) -> TrackGeometry:
    """Stack a list of TrackGeometry into a batch (leading axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *tracks)


class SegmentQuery(NamedTuple):
    idx: jax.Array      # int32 nearest tile/segment index
    dist: jax.Array     # unsigned distance to the segment
    lateral: jax.Array  # signed lateral offset (positive = +u = right of travel)
    tangent: jax.Array  # (2,) unit direction of travel
    closest: jax.Array  # (2,) closest point on the centerline


def nearest_segment(geom: TrackGeometry, p: jax.Array) -> SegmentQuery:
    """Nearest centerline segment to point ``p`` (2,)."""
    a, b = geom.seg_a, geom.seg_b                      # (P,2)
    d = b - a
    l2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
    t = jnp.clip(jnp.sum((p - a) * d, -1) / l2, 0.0, 1.0)
    closest = a + t[:, None] * d
    delta = p - closest
    dist2 = jnp.sum(delta * delta, -1)
    dist2 = jnp.where(geom.valid, dist2, jnp.inf)
    idx = jnp.argmin(dist2)
    dist = jnp.sqrt(dist2[idx])
    tangent = d[idx] / jnp.sqrt(l2[idx])
    # lateral sign: cross(tangent, delta) > 0 means left of travel; the
    # reference's +u offset direction is the right side of travel.
    cross = tangent[0] * delta[idx][1] - tangent[1] * delta[idx][0]
    lateral = jnp.where(cross > 0, -dist, dist)
    return SegmentQuery(idx.astype(jnp.int32), dist, lateral, tangent,
                        closest[idx])


def on_road(dist: jax.Array) -> jax.Array:
    return dist <= TRACK_WIDTH


def sample_texture(geom: TrackGeometry, p: jax.Array):
    """Nearest-texel lookup of (base_idx, lane_idx) at world point(s) ``p``.

    p: (..., 2) -> (base, lane) uint8 arrays of shape (...).
    Outside the playfield returns (0, 0) (renderer paints the GL clear color).
    """
    tex_size = geom.tex.shape[0]
    s = tex_size / (2.0 * PLAYFIELD)
    ij = jnp.floor((p + PLAYFIELD) * s).astype(jnp.int32)
    inb = jnp.all((ij >= 0) & (ij < tex_size), axis=-1)
    ij = jnp.clip(ij, 0, tex_size - 1)
    vals = geom.tex[ij[..., 0], ij[..., 1]]
    vals = jnp.where(inb, vals, 0)
    return vals // 8, vals % 8
