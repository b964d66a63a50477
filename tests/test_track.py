import jax
import jax.numpy as jnp
import numpy as np

from state_policy_diffusionmodel_tpu import track as T


def test_make_track_valid():
    tr = T.make_track(seed=42)
    assert 100 < tr.n < T.MAX_TRACK_PTS
    xy = tr.xy[: tr.n]
    # closed loop: first and last points are close (glue check)
    assert np.linalg.norm(xy[0] - xy[-1]) < 3 * 3.5
    # consecutive points are TRACK_DETAIL_STEP apart
    d = np.linalg.norm(np.diff(xy, axis=0), axis=-1)
    np.testing.assert_allclose(d, 3.5, atol=1e-3)
    # inside the playfield
    assert np.abs(xy).max() < T.PLAYFIELD


def test_tracks_differ_by_seed():
    a, b = T.make_track(1), T.make_track(2)
    assert a.n != b.n or not np.allclose(a.xy[: a.n], b.xy[: b.n])


def test_deterministic():
    a, b = T.make_track(7), T.make_track(7)
    assert a.n == b.n
    np.testing.assert_array_equal(a.xy, b.xy)


def test_lane_points_offsets():
    tr = T.make_track(3)
    lanes = T.lane_points(tr)
    assert lanes.shape == (5, tr.n + 1, 2)
    # middle lane == centerline
    np.testing.assert_allclose(lanes[2, 1:], tr.xy[: tr.n], atol=1e-5)
    # outer lanes are offset by TRACK_WIDTH + 2
    d = np.linalg.norm(lanes[0, 1:] - tr.xy[: tr.n], axis=-1)
    np.testing.assert_allclose(d, T.TRACK_WIDTH + 2, atol=1e-4)


def test_nearest_segment_on_and_off_road():
    tr = T.make_track(5)
    geom = T.build(tr, bake=False)
    # a centerline point is on-road with ~zero distance
    p = jnp.asarray(tr.xy[10])
    idx, dist, lat, tang, closest = T.nearest_segment(geom, p)
    assert float(dist) < 1e-3
    assert bool(T.on_road(dist))
    assert idx in (10, 11)
    # a point laterally offset by TRACK_WIDTH+5 is off-road
    u = np.array([np.cos(tr.beta[10]), np.sin(tr.beta[10])])
    p2 = jnp.asarray(tr.xy[10] + (T.TRACK_WIDTH + 5) * u)
    _, dist2, lat2, _, _ = T.nearest_segment(geom, p2)
    assert not bool(T.on_road(dist2))
    # +u offset is positive lateral by convention
    assert float(lat2) > 0


def test_texture_bake_contains_road_and_lanes():
    tr = T.make_track(9)
    geom = T.build(tr, bake=True)
    tex = np.asarray(geom.tex)
    base, lane = tex // 8, tex % 8
    assert set(np.unique(base)) <= {0, 1, 2, 3, 4, 5}
    assert (base >= 1).mean() > 0.005  # road covers some % of the field
    assert set(np.unique(lane)) == {0, 1, 2, 3, 4, 5}
    # sample at a centerline point: road base, magenta middle lane on top
    b, l = T.sample_texture(geom, jnp.asarray(tr.xy[20]))
    assert int(b) in (1, 2, 3)
    assert int(l) == 3
    # off-field -> background
    b2, l2 = T.sample_texture(geom, jnp.array([T.PLAYFIELD + 10.0, 0.0]))
    assert int(b2) == 0 and int(l2) == 0


def test_stack_batches():
    geoms = [T.build(T.make_track(s), bake=False) for s in (1, 2)]
    batch = T.stack(geoms)
    assert batch.seg_a.shape == (2, T.MAX_TRACK_PTS, 2)
    q = jax.vmap(T.nearest_segment)(batch, batch.seg_b[:, 5])
    dist = q.dist
    assert dist.shape == (2,)


def test_border_texture_alternation():
    """Border quads on hard turns alternate white (even tile index) / red
    (odd) and sit on the outside of the turn, side = sign(beta_prev - beta_i)
    (car_racing.py:311-325,359-379)."""
    from state_policy_diffusionmodel_tpu.track import texture as tx
    from state_policy_diffusionmodel_tpu.track.generator import (
        BORDER, TRACK_WIDTH, PLAYFIELD)

    tr = T.make_track(11)
    assert tr.border[: tr.n].any(), "seed 11 must have hard-turn borders"
    tex = tx.bake_texture(tr)
    n = tr.n
    pts, beta = tr.xy[:n], tr.beta[:n]
    u = np.stack([np.cos(beta), np.sin(beta)], -1)
    s = tx.world_to_texel_scale(tex.shape[0])

    checked = matched = 0
    seen = set()
    for i in range(n):
        if not tr.border[i]:
            continue
        j = (i - 1) % n
        side = np.sign(beta[j] - beta[i]) or 1.0
        mid = 0.5 * (pts[i] + pts[j]) + side * (
            TRACK_WIDTH + BORDER / 2.0) * 0.5 * (u[i] + u[j])
        ti, tj = np.floor((mid + PLAYFIELD) * s).astype(int)
        expected = tx.BORDER_WHITE if i % 2 == 0 else tx.BORDER_RED
        got = tex[ti, tj, 0]
        checked += 1
        matched += int(got == expected)
        if got in (tx.BORDER_WHITE, tx.BORDER_RED):
            seen.add(int(got))
    assert checked > 20
    # centers can be overdrawn where consecutive border quads overlap on
    # tight turns; the alternation must still dominate
    assert matched / checked > 0.8, (matched, checked)
    assert seen == {tx.BORDER_WHITE, tx.BORDER_RED}
