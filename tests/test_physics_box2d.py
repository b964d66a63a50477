"""Golden-trace parity vs the REFERENCE Box2D physics.

Fixtures in `fixtures/box2d_traces.npz` were captured by running the actual
reference `Car` (`/root/reference/envs/car_dynamics.py:227-321`) in a
headless Box2D world stepped like the reference env
(`world.Step(1/50, 6*30, 2*30)`, `/root/reference/envs/car_racing.py:456`)
— see `box2d_fixture_gen.py` (single source of the action sequences).

These tests replay the same action sequences through this repo's analytic
physics and bound the positional divergence against the recorded Box2D
trajectories. Tolerances are set from the divergence measured at capture
time (recorded in the fixture as `drift_at_capture` and in PARITY.md) with
2x headroom + a small absolute floor — tight enough that removing any one
piece of the tire/integration model (friction circle, brake lock, engine
curve, Box2D's per-step translation clamp) fails immediately.
"""

import os

import numpy as np
import pytest

from box2d_fixture_gen import (DT, PID_STEPS, PID_TRACK_SEED, FIXTURE,
                               run_ours_flat, scenario_actions)

FLAT_SCENARIOS = sorted(scenario_actions().keys())


@pytest.fixture(scope="module")
def traces():
    if not os.path.exists(FIXTURE):
        pytest.skip("run tests/box2d_fixture_gen.py to capture fixtures")
    return np.load(FIXTURE)


def _tolerance(capture_drift: np.ndarray) -> np.ndarray:
    return 2.0 * capture_drift + 0.1


@pytest.mark.parametrize("name", FLAT_SCENARIOS)
def test_flat_scenario_parity(traces, name):
    actions = traces[f"{name}/actions"]
    surface = str(traces[f"{name}/surface"])
    # the stored action sequence must match the in-repo definition (else the
    # fixture is stale and the comparison meaningless)
    ref_actions, ref_surface = scenario_actions()[name]
    np.testing.assert_array_equal(actions, ref_actions)
    assert surface == ref_surface

    box2d_pos = traces[f"{name}/pos"]
    box2d_angle = traces[f"{name}/angle"]
    capture = traces[f"{name}/drift_at_capture"]

    pos, angle = run_ours_flat(actions, surface)
    drift = np.linalg.norm(pos - box2d_pos, axis=-1)

    tol = _tolerance(capture)
    for t in (10, 50, 100, len(drift) - 1):
        assert drift[t] <= tol[t], (
            f"{name}: drift {drift[t]:.3f} u at t={t} exceeds "
            f"{tol[t]:.3f} (capture-time drift {capture[t]:.3f})")
    # heading parity on the stable early portion
    assert abs(angle[50] - box2d_angle[50]) < 0.05


def test_pid_trace_parity(traces):
    """600-step lane-follow PID action trace replayed open-loop: this repo's
    env (analytic physics + centerline tile contacts) vs reference Box2D
    with the same track's tiles installed as sensor bodies."""
    import jax
    import jax.numpy as jnp

    from state_policy_diffusionmodel_tpu import envs, track as T

    assert int(traces["pid_trace/track_seed"]) == PID_TRACK_SEED
    actions = traces["pid_trace/actions"]
    box2d_pos = traces["pid_trace/pos"]
    capture = traces["pid_trace/drift_at_capture"]
    assert actions.shape == (PID_STEPS, 3)

    geom = T.build(T.make_track(PID_TRACK_SEED), bake=False)
    state, _ = jax.jit(lambda g: envs.reset(g, render=False))(geom)

    @jax.jit
    def replay(state, acts):
        def body(s, a):
            s = envs.physics_step(s, geom, a)
            return s, s.car.pos
        return jax.lax.scan(body, state, acts)

    _, pos = replay(state, jnp.asarray(actions))
    drift = np.linalg.norm(np.asarray(pos) - box2d_pos[1:], axis=-1)

    tol = _tolerance(capture)
    for t in (50, 100, 200, 400, PID_STEPS - 1):
        assert drift[t] <= tol[t], (
            f"pid_trace drift {drift[t]:.3f} u at t={t} exceeds "
            f"{tol[t]:.3f} (capture {capture[t]:.3f})")
    # the replayed trajectory must end on the playfield and have actually
    # driven somewhere (the PID lapped a good fraction of the track)
    path_len = np.sum(np.linalg.norm(np.diff(np.asarray(pos), axis=0),
                                     axis=-1))
    assert path_len > 200.0


def test_speed_cap_matches_box2d():
    """Box2D's b2_maxTranslation clamp = a hard 100 u/s cap at dt=1/50; full
    throttle must saturate exactly there (measured: reference hits 100.000)."""
    actions = np.zeros((400, 3), np.float32)
    actions[:, 1] = 1.0
    pos, _ = run_ours_flat(actions, "road")
    speed = np.linalg.norm(np.diff(pos, axis=0), axis=-1) / DT
    assert speed.max() <= 100.0 + 1e-3
    assert speed[-50:].min() > 99.9
