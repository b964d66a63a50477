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
