"""Golden-frame regression for the rasterizer.

The fixtures were captured from the round-1 renderer (track seed 11, 40
driven steps at action [0.15, 0.7, 0.02], plus an overlay render) and every
subsequent rewrite — plane layout, one-hot colorization, Pallas sampler (on
TPU), polygon trimming — reproduced them byte-for-byte. A small per-frame
budget (<=30 of 27,648 bytes) absorbs polygon-edge pixels flipping under
matmul-precision configs; real regressions change thousands of bytes.
Regenerate: track seed 11, jit(envs.reset), 40 jit(envs.step) at
[0.15, 0.7, 0.02], snapshot every 10th frame's car state + obs/augm.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from state_policy_diffusionmodel_tpu import track as T
from state_policy_diffusionmodel_tpu.render import raster

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def golden():
    frames = np.load(os.path.join(FIX, "golden_frames.npz"))
    with open(os.path.join(FIX, "golden_states.pkl"), "rb") as f:
        cars = pickle.load(f)
    return frames, cars


def _assert_frames_match(img, gold, msg):
    """Near-exact: ≤30 of 27,648 bytes may differ (polygon-edge pixels can
    flip with matmul-precision config via 1-ulp vertex shifts); any real
    rendering regression changes thousands of bytes."""
    n_diff = int((np.asarray(img) != gold).sum())
    assert n_diff <= 30, f"{msg}: {n_diff} bytes differ"


def test_render_matches_golden_frames(golden):
    frames, cars = golden
    geom = T.build(T.make_track(11), bake=True)
    rend = jax.jit(raster.render)
    for i, car_np in enumerate(cars):
        car = jax.tree.map(jnp.asarray, car_np)
        obs, augm = rend(car, geom)
        _assert_frames_match(obs, frames[f"f{i}_obs"], f"frame {i} obs")
        _assert_frames_match(augm, frames[f"f{i}_augm"], f"frame {i} augm")


def test_colorize_select_matches_matmul(golden):
    """The fused select-chain colorizer (SPDM_COLORIZE_PATH=select) must be
    BIT-identical to the one-hot matmul formulation — all-integer ops, so no
    edge-pixel budget applies.  Checked on every reachable palette index and
    on real rendered layer planes (score + overlay exercised)."""
    # adversarial plane: every reachable index tiled across the plane
    reach = np.array(
        [k for k in range(raster.L_SCORE + 1)
         if not (raster.L_LANE0 <= k < raster.L_LANE0 + raster.N_LANES)],
        np.int32)
    plane = jnp.asarray(np.resize(reach, raster.FLAT))
    a = np.asarray(raster._colorize_matmul(plane))
    b = np.asarray(raster._colorize_select(plane))
    np.testing.assert_array_equal(a, b)

    # real frames: full render with both paths (score + overlay on)
    frames, cars = golden
    geom = T.build(T.make_track(11), bake=True)
    car = jax.tree.map(jnp.asarray, cars[-1])
    ov = raster.Overlay(points=jnp.zeros((2, 4, 2)) + car.pos,
                        valid=jnp.array([True, False]))
    score = jnp.float32(-37.2)
    old = os.environ.get("SPDM_COLORIZE_PATH")
    try:
        os.environ["SPDM_COLORIZE_PATH"] = "matmul"
        obs_m, augm_m = jax.jit(raster.render)(car, geom, ov, score)
        os.environ["SPDM_COLORIZE_PATH"] = "select"
        obs_s, augm_s = jax.jit(raster.render)(car, geom, ov, score)
    finally:
        if old is None:
            os.environ.pop("SPDM_COLORIZE_PATH", None)
        else:
            os.environ["SPDM_COLORIZE_PATH"] = old
    np.testing.assert_array_equal(np.asarray(obs_m), np.asarray(obs_s))
    np.testing.assert_array_equal(np.asarray(augm_m), np.asarray(augm_s))


def test_render_overlay_matches_golden(golden):
    frames, cars = golden
    geom = T.build(T.make_track(11), bake=True)
    car = jax.tree.map(jnp.asarray, cars[-1])
    pts = jnp.stack([
        jnp.stack([car.pos + jnp.array([i * 1.0, j * 2.0]) for j in range(5)])
        for i in range(3)
    ])
    ov = raster.Overlay(points=pts, valid=jnp.array([True, True, False]))
    obs, augm = jax.jit(raster.render)(car, geom, ov)
    _assert_frames_match(obs, frames["f5_obs"], "overlay obs")
    _assert_frames_match(augm, frames["f5_augm"], "overlay augm")
