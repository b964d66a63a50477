import jax
import jax.numpy as jnp
import numpy as np
import pytest

from state_policy_diffusionmodel_tpu import envs, physics, track as T
from state_policy_diffusionmodel_tpu.render import camera, render


@pytest.fixture(scope="module")
def geom():
    return T.build(T.make_track(11), bake=True)


@pytest.fixture(scope="module")
def reset_state(geom):
    state, res = jax.jit(envs.reset, static_argnames="render")(geom)
    return state, res


def test_camera_roundtrip():
    scroll = jnp.array([12.0, -5.0])
    angle = jnp.asarray(0.7)
    p = jnp.array([[3.0, 4.0], [-10.0, 2.0]])
    w = camera.world_to_window(p, scroll, angle)
    back = camera.window_to_world(w, scroll, angle)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-4)


def test_camera_car_at_fixed_pixel():
    # the car must land at window (W/2, H/4) -> state pixel row ~71, col ~48
    scroll = jnp.array([50.0, 80.0])
    w = camera.world_to_window(scroll, scroll, jnp.asarray(1.3))
    np.testing.assert_allclose(np.asarray(w), [500.0, 200.0], atol=1e-4)
    col = float(w[0]) * 96 / 1000
    row = 95 - float(w[1]) * 96 / 800
    assert round(col) == 48 and round(row) == 71


def test_reset_frame_layout(reset_state):
    state, res = reset_state
    obs = np.asarray(res.obs)
    augm = np.asarray(res.augmented)
    assert obs.shape == (96, 96, 3) and obs.dtype == np.uint8
    # HUD: bottom 12 rows are mostly black
    assert (obs[84:, :, :].mean(axis=(0, 1)) < 60).all()
    # car hull (dark red 204,0,0) visible around (row 71, col 48)
    patch = obs[60:80, 40:56]
    assert ((patch[..., 0] > 150) & (patch[..., 1] < 80)).any()
    # road grey under the car region
    assert (np.abs(patch.astype(int) - 102).max(-1) < 8).any()
    # augmented frame contains magenta center lane pixels, normal doesn't
    def has_magenta(img):
        return ((img[..., 0] > 200) & (img[..., 1] < 60) & (img[..., 2] > 200)).any()
    assert has_magenta(augm[:84])
    assert not has_magenta(obs[:84])
    # grass checker: both grass shades present
    grass = ((obs[..., 0] == 102) & (obs[..., 2] == 102))
    assert (obs[grass][:, 1] == 204).any() and (obs[grass][:, 1] == 230).any()


def test_step_reward_and_done(geom, reset_state):
    state, _ = reset_state
    stepf = jax.jit(envs.step, static_argnames="render")
    total = 0.0
    for _ in range(30):
        state, res = stepf(state, geom, jnp.array([0.0, 1.0, 0.0]))
        total += float(res.reward)
    # driving forward on the track visits tiles: reward > 30 * -0.1
    assert total > -3.0
    assert int(state.tile_count) > 0
    assert not bool(state.done)


def test_out_of_field_done(geom):
    state = envs.init(geom)
    far = state.car._replace(pos=jnp.array([T.PLAYFIELD + 5.0, 0.0]))
    state = state._replace(car=far)
    state, res = envs.step(state, geom, jnp.array([0.0, 0.0, 0.0]), render=False)
    assert bool(res.done)
    assert float(res.reward) == -100.0


def test_auto_reset(geom):
    state = envs.init(geom)
    state = state._replace(done=jnp.asarray(True),
                           reward=jnp.asarray(55.0, jnp.float32))
    state = envs.auto_reset(state, geom)
    assert not bool(state.done)
    assert float(state.reward) == 0.0
    np.testing.assert_allclose(
        np.asarray(state.car.pos), np.asarray(geom.start[1:3]), atol=1e-5
    )


def test_reset_car_roundtrip(geom, reset_state):
    state, _ = reset_state
    saved = physics.save_state(state.car)
    state2 = envs.reset_car(state, saved + 0)
    np.testing.assert_allclose(
        np.asarray(state2.car.pos), np.asarray(state.car.pos), atol=1e-5
    )


def test_vector_rollout(geom):
    geoms = T.stack([T.build(T.make_track(s), bake=False) for s in (1, 2, 3, 4)])
    states, res = envs.vector.reset_batch(geoms, render=False)
    assert res.obs.shape == (4, 96, 96, 3)
    actions = jnp.tile(jnp.array([0.0, 0.5, 0.0]), (4, 1))
    states, traj = envs.vector.rollout_constant(
        states, geoms, actions, n_steps=20, render=False)
    assert traj.reward.shape == (20, 4)
    assert bool(jnp.all(jnp.isfinite(traj.reward)))
    # cars moved
    assert float(jnp.abs(states.car.vel).max()) > 0.5


def test_window_origin_covers_viewport():
    """The Pallas sampler's analytic (oi, oj) window must cover every
    in-field pixel's texel for any camera pose (pallas_sampler.window_origin)."""
    from state_policy_diffusionmodel_tpu.render import pallas_sampler as ps
    from state_policy_diffusionmodel_tpu.render.raster import _pixel_planes
    from state_policy_diffusionmodel_tpu.track.generator import PLAYFIELD

    _, _, rx, ry = jax.jit(_pixel_planes)()
    rx, ry = np.asarray(rx), np.asarray(ry)
    rng = np.random.default_rng(0)
    T_ = 1024
    s = T_ / (2.0 * PLAYFIELD)
    for _ in range(50):
        ang = rng.uniform(-np.pi, np.pi)
        pos = rng.uniform(-PLAYFIELD, PLAYFIELD, 2).astype(np.float32)
        c, si = np.cos(ang, dtype=np.float32), np.sin(ang, dtype=np.float32)
        px = c * rx + si * ry + pos[0]
        py = -si * rx + c * ry + pos[1]
        fx, fy = (px + PLAYFIELD) * s, (py + PLAYFIELD) * s
        fi = np.floor(fx).astype(int)
        fj = np.floor(fy).astype(int)
        infield = (fx >= 0) & (fx < T_) & (fy >= 0) & (fy < T_)
        oi, oj, oj_al = jax.jit(
            lambda ca, sa, p: ps.window_origin(T_, ca, sa, p)
        )(jnp.float32(c), jnp.float32(si), jnp.asarray(pos))
        oi, oj, oj_al = int(oi), int(oj), int(oj_al)
        assert oi % 8 == 0 and oj_al % 128 == 0
        li, lj = fi - oi, fj - oj
        lj_al = fj - oj_al
        assert li[infield].min() >= 0 and li[infield].max() < ps.WIN_I
        assert lj[infield].min() >= 0 and lj[infield].max() < ps.LANES
        assert lj_al[infield].max() < ps.WIN_J


def test_palette_matches_float_rounding():
    """PALETTE_U8 must equal round(clip(c)*255) of every f32 layer color
    (one-hot matmul colorization is exact integer math on these)."""
    from state_policy_diffusionmodel_tpu.render import raster
    from state_policy_diffusionmodel_tpu.track import texture as tx

    pal = raster.PALETTE_U8
    ref = lambda c: np.asarray(
        jnp.round(jnp.clip(jnp.asarray(c, jnp.float32), 0, 1) * 255)
    ).astype(np.uint8)
    np.testing.assert_array_equal(pal[raster.L_OUTFIELD], ref(tx.OUTFIELD))
    np.testing.assert_array_equal(pal[raster.L_GRASS_DARK], ref(tx.GRASS_DARK))
    np.testing.assert_array_equal(pal[raster.L_GRASS_LIGHT], ref(tx.GRASS_LIGHT))
    for k in range(1, 6):
        np.testing.assert_array_equal(pal[raster.L_BASE0 + k - 1],
                                      ref(tx.BASE_PALETTE[k]))
        np.testing.assert_array_equal(pal[raster.L_LANE0 + k - 1],
                                      ref(tx.LANE_PALETTE[k]))
    np.testing.assert_array_equal(pal[raster.L_CAR0 + 8], ref([0.8, 0.0, 0.0]))
    np.testing.assert_array_equal(pal[raster.L_CAR0 + 1], ref([0.3, 0.3, 0.3]))


def test_hud_indicator_geometry(geom):
    """Reference HUD geometry (car_racing.py:713-773): s=W/40, h=H/40;
    speed bar at place 5 (white, val=0.02*speed), ABS bars at places 7-10
    (blue / (0.2,0,1), val=0.01*omega), steering at place 20 (green, horiz,
    val=-10*joint_angle), gyro at place 30 (red, horiz, val=-0.8*angvel).
    Window -> state mapping: col = wx*96/1000, row = 95 - wy*96/800."""
    state = envs.init(geom)
    car = state.car._replace(
        vel=jnp.array([50.0, 0.0]),                      # speed 50: val 1.0
        omega=jnp.full(4, 100.0),                        # val 1.0
        joint_angle=jnp.array([-0.2, -0.2, 0.0, 0.0]),   # val 2.0
        angular_vel=jnp.asarray(-1.25),                  # val 1.0
    )
    obs, _ = jax.jit(render)(car, geom)
    obs = np.asarray(obs)
    # speed bar: wx in [125,150] -> col 13; wy in [20,40] -> rows 91-92
    np.testing.assert_array_equal(obs[91, 13], [255, 255, 255])
    np.testing.assert_array_equal(obs[92, 13], [255, 255, 255])
    # ABS wheel 0 at place 7 (wx 175-200 -> col 18), pure blue
    np.testing.assert_array_equal(obs[91, 18], [0, 0, 255])
    # ABS wheel 2 at place 9 (wx 225-250 -> col 23), (0.2,0,1)
    np.testing.assert_array_equal(obs[91, 23], [51, 0, 255])
    # steering: wx [500,550] -> col 50; wy [40,80] -> row 88, green
    np.testing.assert_array_equal(obs[88, 50], [0, 255, 0])
    # gyro: wx [750,775] -> col 73, red
    np.testing.assert_array_equal(obs[88, 73], [255, 0, 0])
    # HUD bar itself is black between indicators
    np.testing.assert_array_equal(obs[91, 40], [0, 0, 0])


def test_lane_colors_at_reference_offsets(reset_state):
    """The five behavior lanes (car_racing.py:382-414,657-676): yellow at
    -(W+2), cyan at -(W-2), magenta center, purple +(W-2), blue +(W+2).
    In the augmented frame they must appear in that lateral order with
    world gaps 4, 4.67, 4.67, 4 units = 6.2, 7.3, 7.3, 6.2 px at the fixed
    zoom (16.2 * 96/1000 = 1.555 px/unit)."""
    _, res = reset_state
    augm = np.asarray(res.augmented)
    LANES = {
        "yellow": (255, 255, 0), "cyan": (0, 255, 255),
        "magenta": (255, 0, 255), "purple": (128, 26, 128),
        "blue": (0, 0, 255),
    }
    names = list(LANES)
    found = None
    for row in range(20, 62):       # above the car band, below the horizon
        cols = {}
        for nm, c in LANES.items():
            m = np.all(augm[row] == np.array(c, np.uint8), -1)
            if m.any():
                cols[nm] = float(np.flatnonzero(m).mean())
        if len(cols) == 5:
            found = cols
            break
    assert found, "no scan row shows all five lanes"
    seq = np.array([found[n] for n in names])
    d = np.diff(seq)
    assert (d > 0).all() or (d < 0).all(), f"lanes out of order: {found}"
    np.testing.assert_allclose(np.abs(d), [6.2, 7.3, 7.3, 6.2], atol=2.5)


def test_render_overlay_draws_red_points(geom, reset_state):
    state, res0 = reset_state
    from state_policy_diffusionmodel_tpu.render import Overlay

    pts = jnp.stack([jnp.stack([state.car.pos + jnp.array([i * 2.0, j * 3.0])
                                for j in range(4)]) for i in range(2)])
    ov = Overlay(points=pts, valid=jnp.array([True, False]))
    obs, augm = jax.jit(render)(state.car, geom, ov)
    obs0 = np.asarray(res0.obs)
    obs = np.asarray(obs)
    red = (obs[..., 0] == 255) & (obs[..., 1] == 0) & (obs[..., 2] == 0)
    red0 = (obs0[..., 0] == 255) & (obs0[..., 1] == 0) & (obs0[..., 2] == 0)
    assert red.sum() > red0.sum()  # overlay added red pixels


def test_render_overlay_reference_scale(geom, reset_state):
    """The reference points buffer holds up to 100 polylines
    (car_racing.py:704-710, deque maxlen=100); rendering at that scale must
    compile in bounded time (chunked-scan segment loop, not a python
    unroll) and still draw."""
    state, res0 = reset_state
    from state_policy_diffusionmodel_tpu.render import Overlay

    k, L = 100, 8
    offs = np.stack(np.meshgrid(np.arange(k), np.arange(L),
                                indexing="ij"), -1).astype(np.float32)
    pts = jnp.asarray(np.asarray(state.car.pos) +
                      offs * np.float32(0.5) - 10.0)       # (100, 8, 2)
    ov = Overlay(points=pts, valid=jnp.ones(k, bool))
    obs, augm = jax.jit(render)(state.car, geom, ov)
    obs = np.asarray(obs)
    red = (obs[..., 0] == 255) & (obs[..., 1] == 0) & (obs[..., 2] == 0)
    obs0 = np.asarray(res0.obs)
    red0 = (obs0[..., 0] == 255) & (obs0[..., 1] == 0) & (obs0[..., 2] == 0)
    assert red.sum() > red0.sum()


def test_sharded_rollout_over_mesh(geom):
    """Env rollout sharded over the 8-device virtual mesh via shard_map must
    match the unsharded rollout exactly."""
    from state_policy_diffusionmodel_tpu import parallel

    mesh = parallel.make_mesh()
    geoms = T.stack([T.build(T.make_track(s), bake=False) for s in range(2)])
    B = 16
    tids = jnp.arange(B, dtype=jnp.int32) % 2
    states = jax.jit(envs.vector.init_batch)(geoms, tids)
    actions = jnp.tile(jnp.array([0.0, 0.6, 0.0]), (B, 1))

    s1, traj1 = envs.vector.rollout_constant_sharded(
        mesh, states, geoms, actions, n_steps=10, render=False,
        track_ids=tids)
    # reference: plain vmapped scan
    def body(ss, _):
        ss, res = envs.vector.step_batch(ss, geoms, actions, render=False,
                                         track_ids=tids)
        ss = jax.vmap(
            lambda s, t: envs.auto_reset(
                s, envs.vector.gather_geom(geoms, t)))(ss, tids)
        return ss, res
    s2, traj2 = jax.jit(
        lambda st: jax.lax.scan(body, st, None, length=10))(states)

    np.testing.assert_allclose(np.asarray(traj1.reward),
                               np.asarray(traj2.reward), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.car.pos),
                               np.asarray(s2.car.pos), atol=1e-5)


def test_sharded_policy_rollout_matches_single_device(geom):
    """The CLOSED-LOOP policy rollout (denoiser under shard_map, params
    replicated, envs + obs rings sharded over `data`) must produce the
    same per-env actions on the 8-device mesh as on one device: the x_T
    reverse-diffusion draws are keyed per GLOBAL env id
    (diffusion/closed_loop.py), so sharding cannot change the policy."""
    from jax.sharding import Mesh

    from state_policy_diffusionmodel_tpu import diffusion, parallel

    cfg = diffusion.PolicyConfig(
        noise_steps=20, obs_horizon=3, pred_horizon=6, inpaint_horizon=1,
        model="UNet", model_width=8, vision_encoder="none", step_size=2)
    pol = diffusion.DiffusionPolicy(cfg)
    params = pol.init_params(jax.random.key(0))

    geoms = T.stack([T.build(T.make_track(s), bake=False) for s in range(2)])
    B = 16
    tids = jnp.arange(B, dtype=jnp.int32) % 2
    pol_fn = diffusion.make_ring_policy(pol, num_inference_steps=2,
                                        sampler="ddim")

    def run(mesh):
        carry = diffusion.init_ring_carry(pol, B)
        _, _, acts, rews = envs.vector.rollout_policy_sharded(
            mesh, params, geoms, pol_fn, carry, n_steps=4, render=False,
            track_ids=tids)
        return np.asarray(acts), np.asarray(rews)

    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                 ("data", "model"))
    a1, r1 = run(mesh1)
    a8, r8 = run(parallel.make_mesh())
    assert a1.shape == (4, B, 3)
    assert np.isfinite(a1).all()
    np.testing.assert_allclose(a8, a1, atol=1e-5)
    np.testing.assert_allclose(r8, r1, atol=1e-6)


def test_score_label_rasterization(geom, reset_state):
    """The pyglet score label ("%04i" % reward, font_size 36 at window
    (20, 50), white — car_racing.py:504-512,774-775) is approximated as
    7-segment digits on the same pixels."""
    from state_policy_diffusionmodel_tpu.render import raster

    state, res = reset_state

    def white_px(obs):
        return (np.asarray(obs) == 255).all(-1)

    # env frames include the label: white pixels confined to the label's
    # footprint (window x in [20,100], y in [37.5,62.5] -> rows ~87-92,
    # cols ~1-10), inside the otherwise-black HUD bar
    w = white_px(res.obs)
    assert w[86:93, :12].sum() >= 10
    assert w[86:93, 16:].sum() == 0          # nothing right of the label
    assert w[93:, :].sum() == 0 and w[84:86, :].sum() == 0

    rend = jax.jit(raster.render)
    obs_a, augm_a = rend(state.car, geom, None, jnp.float32(123.0))
    obs_b, _ = rend(state.car, geom, None, jnp.float32(-5.0))
    obs_none, _ = rend(state.car, geom)
    # distinct scores -> distinct glyph patterns; augmented frame matches
    assert (white_px(obs_a) != white_px(obs_b)).any()
    np.testing.assert_array_equal(np.asarray(obs_a)[84:],
                                  np.asarray(augm_a)[84:])
    # score=None omits the label entirely (golden-fixture compatibility)
    assert white_px(obs_none)[84:].sum() == 0

    # glyph math: "%04i" zero-pads and truncates toward zero, '-' leads
    chars = raster._score_chars(jnp.float32(123.9))
    np.testing.assert_array_equal(np.asarray(chars), [0, 1, 2, 3])
    chars = raster._score_chars(jnp.float32(-5.2))
    np.testing.assert_array_equal(np.asarray(chars), [10, 0, 0, 5])
