import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from state_policy_diffusionmodel_tpu import control, data, envs, track as T
from state_policy_diffusionmodel_tpu.data import normalize as N


def test_pid_matches_simple_pid_semantics():
    p = control.pid_params(2.0, 0.5, 0.1, setpoint=1.0)
    s = control.pid_init()
    out, s = control.pid_update(p, s, 0.0, dt=0.02)
    # first call: error=1, integral=0.5*1*0.02, derivative=0 (no last input)
    assert out == pytest.approx(2.0 * 1.0 + 0.01)
    out2, s = control.pid_update(p, s, 0.5, dt=0.02)
    # derivative on measurement: -Kd * (0.5-0.0)/0.02
    assert out2 == pytest.approx(2.0 * 0.5 + 0.01 + 0.5 * 0.5 * 0.02 - 0.1 * 25.0)


def test_ring_buffer():
    r = control.ring_init(3)
    for v in (3.0, 6.0):
        r = control.ring_push(r, v)
    assert float(control.ring_mean(r)) == pytest.approx(3.0)  # zeros included


def test_lane_follow_steers_toward_lane():
    params = control.lane_follow_params("middle", target_velocity=20.0)
    state = control.lane_follow_init()
    augm = np.zeros((96, 96, 3), np.uint8)
    augm[60, 55] = (255, 0, 255)  # magenta lane to the right of center
    action, state2 = control.lane_follow(params, state,
                                         jnp.asarray(augm), jnp.asarray(5.0))
    # target right of center -> err>0 -> angle<0 -> pid out >0 -> env steers right
    assert float(action[0]) > 0
    assert float(action[1]) > 0  # below target speed -> gas
    # lane not visible: action repeats, state frozen
    action3, state3 = control.lane_follow(params, state2,
                                          jnp.zeros((96, 96, 3), jnp.uint8),
                                          jnp.asarray(5.0))
    np.testing.assert_allclose(np.asarray(action3), np.asarray(action), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state3.err_buf.buf),
                               np.asarray(state2.err_buf.buf))


def test_center_follow_on_synthetic_strip():
    obs = np.zeros((96, 96, 3), np.uint8)
    obs[:, :, 1] = 230  # all grass
    obs[:, :, 0] = 102
    obs[:, :, 2] = 102
    obs[:, 30:67, :] = 102  # road band shifted left of center (middle ~48)
    action = control.center_follow(jnp.asarray(obs), jnp.asarray(30.0),
                                   target_velocity=30.0)
    a = np.asarray(action)
    assert a.shape == (3,)
    assert np.isfinite(a).all()
    # at target speed: no gas, no brake
    assert a[1] == pytest.approx(0.0, abs=1e-5)
    assert a[2] == pytest.approx(0.0, abs=1e-5)


def test_sinusoidal_produces_bounded_actions():
    geom = T.build(T.make_track(21), bake=False)
    state = envs.init(geom)
    action = control.sinusoidal(state.car, geom, jnp.asarray(0.0))
    a = np.asarray(action)
    assert np.isfinite(a).all()
    assert a[1] >= 0 and a[2] >= 0


def test_replay_buffer_roundtrip(tmp_path):
    buf = data.ReplayBuffer.create_empty_numpy()
    ep = {"img": np.random.rand(50, 8, 8, 3).astype(np.float32),
          "position": np.random.randn(50, 2).astype(np.float32),
          "velocity": np.random.randn(50, 2).astype(np.float32),
          "action": np.random.randn(50, 3).astype(np.float32)}
    buf.add_episode(ep)
    buf.add_episode({k: v[:30] for k, v in ep.items()})
    assert buf.n_episodes == 2 and buf.n_steps == 80
    np.testing.assert_array_equal(buf.episode_ends, [50, 80])

    path = str(tmp_path / "test.zarr")
    buf.save_to_path(path, make_zip=True)
    loaded = data.load_zarr(path)
    np.testing.assert_allclose(loaded.data["img"], buf.data["img"])
    np.testing.assert_array_equal(loaded.episode_ends, buf.episode_ends)
    # zip round trip
    loaded2 = data.load_zarr(path + ".zip")
    np.testing.assert_allclose(loaded2.data["position"], buf.data["position"])
    # episode API
    e0 = buf.get_episode(0)
    assert len(e0["img"]) == 50
    popped = buf.pop_episode()
    assert len(popped["img"]) == 30 and buf.n_episodes == 1


def test_window_indices_match_reference_semantics():
    ends = [20, 35]
    idx = N.create_sample_indices_sparse(ends, sequence_length=4, step_size=5)
    # window needs start + 4*5 <= end
    assert ([0, 20, 0, 4] == idx[0]).all()
    starts = idx[:, 0]
    assert starts.max() <= 15
    # all windows stay inside one episode
    for s, e, _, _ in idx:
        assert (s < 20) == (e <= 20)


def test_dense_indices_padding():
    idx = N.create_sample_indices(np.array([10]), 4, pad_before=2, pad_after=2)
    assert (idx[0] == [0, 2, 2, 4]).all()
    assert (idx[-1] == [8, 10, 0, 2]).all()
    data_ = {"x": np.arange(10, dtype=np.float32)[:, None]}
    w = N.sample_sequence(data_, 4, *idx[0])
    np.testing.assert_allclose(w["x"][:, 0], [0, 0, 0, 1])


def test_normalize_roundtrip():
    stats = {"min": np.array([-2.0, 0.0]), "max": np.array([2.0, 4.0])}
    x = np.array([[0.0, 1.0], [1.0, 3.0]])
    n = N.normalize_data(x, stats)
    assert n.min() >= -1 and n.max() <= 1
    np.testing.assert_allclose(N.unnormalize_data(n, stats), x, atol=1e-6)

    pos_stats = {"min": np.float32(-10.0), "max": np.float32(10.0)}
    w = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], np.float32)
    npos, trans = N.normalize_position(w, pos_stats)
    np.testing.assert_allclose(npos[0], 0.0, atol=1e-6)
    back = N.unnormalize_position(npos, trans, pos_stats)
    np.testing.assert_allclose(back, w, atol=1e-5)


@pytest.mark.slow
def test_collect_and_window_end_to_end(tmp_path):
    episodes = data.collect_episodes(
        seeds=[31, 32], driver="lane_follow", mode="middle",
        target_velocity=25.0, n_steps=120, chunk=60)
    assert len(episodes) == 2
    ep = episodes[0]
    assert ep["img"].shape == (120, 96, 96, 3)
    assert ep["img"].max() <= 1.0
    assert np.isfinite(ep["action"]).all()
    # car should be moving by the end
    assert np.abs(ep["velocity"][-20:]).max() > 1.0

    buf = data.ReplayBuffer.create_empty_numpy()
    for e in episodes:
        buf.add_episode(e)
    ds = data.WindowDataset(buf, obs_horizon=4, pred_horizon=8, step_size=5)
    assert len(ds) > 0
    w = ds.get_window(0)
    assert w["position"].shape == (12, 2)
    np.testing.assert_allclose(w["position"][0], 0.0, atol=1e-6)
    assert w["action"].min() >= -1.0 - 1e-6 and w["action"].max() <= 1.0 + 1e-6

    dm = data.DataModule(batch_size=8, T_obs=4, T_pred=8, seed=0, step_size=5)
    dm.data_full = ds
    n = len(ds)
    rng = np.random.default_rng(0)
    dm.train_idx = rng.permutation(n)[: int(n * 0.8)]
    dm.val_idx = rng.permutation(n)[int(n * 0.8):]
    b = next(iter(dm.train_batches(rng)))
    assert b["image"].shape == (8, 12, 96, 96, 3)
    dm.save_stats(str(tmp_path / "STATS.pkl"))
    stats = data.load_stats(str(tmp_path / "STATS.pkl"))
    assert "position" in stats


def test_device_dataset_matches_host_batches():
    """DeviceWindowDataset (in-jit gather + normalize) must produce exactly
    the host pipeline's batches."""
    import numpy as np
    from state_policy_diffusionmodel_tpu.data.dataset import (
        DeviceWindowDataset, WindowDataset)
    from state_policy_diffusionmodel_tpu.data.replay_buffer import ReplayBuffer

    rng = np.random.default_rng(3)
    T = 120
    img_u8 = rng.integers(0, 256, size=(T, 8, 8, 3), dtype=np.uint8)
    buf = ReplayBuffer.create_empty_numpy()
    buf.add_episode({
        "img": img_u8.astype(np.float32) / 255.0,
        "position": rng.normal(size=(T, 2)).astype(np.float32) * 40,
        "velocity": rng.normal(size=(T, 2)).astype(np.float32) * 5,
        "action": rng.normal(size=(T, 3)).astype(np.float32),
    })
    ds = WindowDataset(buf, obs_horizon=4, pred_horizon=6, step_size=2)
    dev = DeviceWindowDataset(ds)
    assert len(dev) == len(ds)
    assert dev._data["image"].dtype.name == "uint8"  # lossless u8 storage

    idx = np.asarray([0, 5, len(ds) - 1, 7])
    host = ds.batch(idx)
    devb = {k: np.asarray(v) for k, v in dev.batch(idx).items()}
    # pre-normalized arrays are moved verbatim: exact
    np.testing.assert_array_equal(devb["velocity"], host["velocity"])
    np.testing.assert_array_equal(devb["action"], host["action"])
    # image /255 and position normalization run in-jit: XLA turns the
    # division into multiply-by-reciprocal, so allow 1 ulp
    np.testing.assert_allclose(devb["image"], host["image"], atol=1e-7)
    np.testing.assert_allclose(devb["position"], host["position"], atol=1e-6)


def test_zarr_live_backend_and_compressors(tmp_path):
    """Live zarr-backed buffer (reference create_empty_zarr + resize-append,
    replay_buffer.py:103-135,443-501) and per-key compressor knobs
    (:242-264)."""
    import json

    from state_policy_diffusionmodel_tpu.data.replay_buffer import (
        ReplayBuffer, ZarrReplayBuffer, load_zarr)

    rng = np.random.default_rng(0)
    ep1 = {"position": rng.normal(size=(20, 2)).astype(np.float32),
           "action": rng.normal(size=(20, 3)).astype(np.float32)}
    ep2 = {"position": rng.normal(size=(15, 2)).astype(np.float32),
           "action": rng.normal(size=(15, 3)).astype(np.float32)}

    p = str(tmp_path / "live.zarr")
    buf = ZarrReplayBuffer.create_empty_zarr(p, compressors="default")
    buf.add_episode(ep1)
    buf.add_episode(ep2)
    assert buf.n_episodes == 2 and buf.n_steps == 35
    np.testing.assert_array_equal(buf.get_episode(1)["action"], ep2["action"])
    sl = buf.get_steps_slice(18, 22)
    np.testing.assert_array_equal(
        sl["position"],
        np.concatenate([ep1["position"][18:], ep2["position"][:2]]))
    # lazy data views slice without loading everything
    v = buf.data["position"]
    assert v.shape == (35, 2)
    np.testing.assert_array_equal(v[20:], ep2["position"])
    # the on-disk layout is plain zarr: the standard loader reopens it
    buf2 = load_zarr(p)
    assert buf2.n_episodes == 2
    np.testing.assert_array_equal(buf2.get_episode(0)["position"],
                                  ep1["position"])
    buf.drop_episode()
    assert buf.n_episodes == 1 and buf.n_steps == 20

    # per-key compressor spec lands in the zarr metadata
    host = ReplayBuffer.create_empty_numpy()
    host.add_episode(ep1)
    p2 = str(tmp_path / "x.zarr")
    host.save_to_path(p2, compressors={
        "position": {"id": "blosc", "cname": "lz4", "clevel": 1,
                     "shuffle": 2}})
    with open(tmp_path / "x.zarr" / "data" / "position" / ".zarray") as f:
        comp = json.load(f)["compressor"]
    assert comp["cname"] == "lz4" and comp["clevel"] == 1


def test_zarr_buffer_reopen_and_save_roundtrip(tmp_path):
    """ADVICE r2: (a) constructing ZarrReplayBuffer on an existing path must
    reopen it (reference create_from_group preserves arrays, overwrite=False,
    replay_buffer.py:136-160), not wipe the episode index; (b) save_to_path
    on a ZarrReplayBuffer must write the actual data arrays (the lazy
    mapping's items()/values() route through tensorstore reads)."""
    import json

    from state_policy_diffusionmodel_tpu.data.replay_buffer import (
        COMPRESSOR_PRESETS, ZarrReplayBuffer, load_zarr)

    rng = np.random.default_rng(1)
    ep1 = {"position": rng.normal(size=(12, 2)).astype(np.float32),
           "action": rng.normal(size=(12, 3)).astype(np.float32)}
    ep2 = {"position": rng.normal(size=(9, 2)).astype(np.float32),
           "action": rng.normal(size=(9, 3)).astype(np.float32)}

    p = str(tmp_path / "live.zarr")
    buf = ZarrReplayBuffer(p)
    buf.add_episode(ep1)
    del buf

    # reopen: the episode index and data arrays survive; appends continue
    buf2 = ZarrReplayBuffer(p)
    assert buf2.n_episodes == 1 and buf2.n_steps == 12
    np.testing.assert_array_equal(buf2.get_episode(0)["position"],
                                  ep1["position"])
    buf2.add_episode(ep2)
    assert buf2.n_episodes == 2 and buf2.n_steps == 21

    # Mapping protocol on the lazy view
    d = buf2.data
    assert "position" in d and d.get("nope") is None
    assert {k for k, _ in d.items()} == {"position", "action"}
    assert all(v.shape[0] == 21 for v in d.values())

    # save_to_path writes real arrays that round-trip through load_zarr
    p2 = str(tmp_path / "copy.zarr")
    buf2.save_to_path(p2)
    back = load_zarr(p2)
    assert back.n_episodes == 2
    np.testing.assert_array_equal(back.get_episode(1)["action"],
                                  ep2["action"])

    # preset parity with the reference (replay_buffer.py:289-295)
    assert COMPRESSOR_PRESETS["default"]["shuffle"] == 0   # lz4 NOSHUFFLE
    assert COMPRESSOR_PRESETS["disk"] == {
        "id": "blosc", "cname": "zstd", "clevel": 5, "shuffle": 2}
    with open(tmp_path / "copy.zarr" / "data" / "position" / ".zarray") as f:
        comp = json.load(f)["compressor"]
    assert comp["cname"] == "zstd" and comp["shuffle"] == 2


def test_zarr_save_relative_path(tmp_path, monkeypatch):
    """tensorstore's file kvstore rejects './'-relative paths; the CLI
    defaults (--base_dir ./data) produce them, so save/load must abspath."""
    from state_policy_diffusionmodel_tpu.data.replay_buffer import (
        ReplayBuffer, load_zarr)

    monkeypatch.chdir(tmp_path)
    buf = ReplayBuffer.create_empty_numpy()
    buf.add_episode({"x": np.arange(7, dtype=np.float32)})
    buf.save_to_path("./sub/rel.zarr")
    back = load_zarr("./sub/rel.zarr")
    np.testing.assert_array_equal(back.data["x"], np.arange(7))
