import jax
import jax.numpy as jnp
import numpy as np
import pytest

from state_policy_diffusionmodel_tpu.physics import (
    CarState, apply_action, apply_brake, apply_gas, apply_steer, constants as C,
    create, restore_state, save_state, step,
)

ROAD = jnp.full(4, C.FRICTION_LIMIT, jnp.float32)


def run_steps(car, n, action=None, friction=ROAD):
    def body(car, _):
        c = apply_action(car, action) if action is not None else car
        return step(c, friction), None
    car, _ = jax.lax.scan(body, car, None, length=n)
    return car


def test_mass_properties_reasonable():
    # hull area from the 4 polygons is ~7 m^2 at SIZE=0.02 scaling
    assert 5.0 < C.HULL_MASS < 10.0
    assert C.WHEEL_MASS == pytest.approx(0.1 * (2 * 14 * 0.02) * (2 * 27 * 0.02))
    assert C.TOTAL_MASS == pytest.approx(C.HULL_MASS + 4 * C.WHEEL_MASS)
    assert C.TOTAL_I > C.HULL_I > 0
    # car is front-back asymmetric: COM slightly off origin, x-symmetric
    assert abs(C.COM_BODY[0]) < 1e-9
    assert abs(C.COM_BODY[1]) < 0.5


def test_car_at_rest_stays_at_rest():
    car = create(0.0, 10.0, 5.0)
    out = run_steps(car, 50)
    np.testing.assert_allclose(out.pos, car.pos, atol=1e-5)
    np.testing.assert_allclose(out.angle, car.angle, atol=1e-6)


def test_gas_ramp_and_rear_wheel_drive():
    car = create(0.0, 0.0, 0.0)
    car = apply_gas(car, 1.0)
    np.testing.assert_allclose(car.gas, [0, 0, 0.1, 0.1], atol=1e-7)
    car = apply_gas(car, 1.0)
    np.testing.assert_allclose(car.gas, [0, 0, 0.2, 0.2], atol=1e-7)
    car = apply_gas(car, 0.0)  # instant decrease
    np.testing.assert_allclose(car.gas, [0, 0, 0, 0], atol=1e-7)


def test_full_gas_accelerates_forward():
    car = create(0.0, 0.0, 0.0)  # angle 0: forward is +y (GetWorldVector (0,1))
    car = run_steps(car, 100, action=jnp.array([0.0, 1.0, 0.0]))
    assert float(car.pos[1]) > 5.0
    assert abs(float(car.pos[0])) < 1.0
    speed = float(jnp.linalg.norm(car.vel))
    assert speed > 10.0
    # rear wheel omegas spun up, fronts follow ground speed
    assert float(car.omega[2]) > 10.0


def test_brake_stops_car():
    car = create(0.0, 0.0, 0.0)
    car = run_steps(car, 100, action=jnp.array([0.0, 1.0, 0.0]))
    v0 = float(jnp.linalg.norm(car.vel))
    car = run_steps(car, 200, action=jnp.array([0.0, 0.0, 0.8]))
    v1 = float(jnp.linalg.norm(car.vel))
    assert v1 < 0.1 * v0


def test_hard_brake_locks_wheels():
    car = create(0.0, 0.0, 0.0)
    car = run_steps(car, 50, action=jnp.array([0.0, 1.0, 0.0]))
    spinning = float(jnp.abs(car.omega).max())
    car = apply_action(car, jnp.array([0.0, 0.0, 1.0]))
    car = step(car, ROAD)
    # the lock zeroes omega, after which only the friction-limited slip update
    # applies (the reference does the same: car_dynamics.py:264-265 then :313),
    # bounding |omega| by dt * FRICTION_LIMIT * wheel_rad / I = 2.7
    limit = C.DT * C.FRICTION_LIMIT * C.WHEEL_RAD / C.WHEEL_MOMENT_OF_INERTIA
    assert float(jnp.abs(car.omega).max()) <= limit + 1e-5 < spinning


def test_steering_turns_car():
    car = create(0.0, 0.0, 0.0)
    car = run_steps(car, 80, action=jnp.array([0.0, 1.0, 0.0]))
    # steer action +s maps to joint target -s (car_racing step negates)
    car = run_steps(car, 100, action=jnp.array([0.5, 0.2, 0.0]))
    assert abs(float(car.angle)) > 0.2
    # joint angle rate-limited to the +-0.4 revolute limits
    assert float(jnp.abs(car.joint_angle).max()) <= 0.4 + 1e-6


def test_steer_servo_rate():
    car = create(0.0, 0.0, 0.0)
    car = apply_steer(car, 0.4)
    car = step(car, ROAD)
    # max slew is STEER_RATE_MAX * dt = 0.06 per step
    np.testing.assert_allclose(car.joint_angle[:2], [0.06, 0.06], atol=1e-6)
    # small error converges exactly in one step
    car2 = create(0.0, 0.0, 0.0)
    car2 = apply_steer(car2, 0.05)
    car2 = step(car2, ROAD)
    np.testing.assert_allclose(car2.joint_angle[:2], [0.05, 0.05], atol=1e-6)


def test_grass_reduces_grip():
    grass = jnp.full(4, C.FRICTION_LIMIT * C.GRASS_FRICTION, jnp.float32)
    action = jnp.array([1.0, 1.0, 0.0])
    on_road = run_steps(create(0.0, 0.0, 0.0), 150, action=action, friction=ROAD)
    on_grass = run_steps(create(0.0, 0.0, 0.0), 150, action=action, friction=grass)
    # lower grip -> wider turn/less heading change under the same input
    assert abs(float(on_grass.angle)) < abs(float(on_road.angle))


def test_save_restore_roundtrip():
    car = create(0.3, 1.0, 2.0)
    car = run_steps(car, 60, action=jnp.array([0.2, 0.8, 0.0]))
    saved = save_state(car)
    assert saved.shape == (30,)
    restored = restore_state(saved)
    np.testing.assert_allclose(restored.pos, car.pos, atol=1e-5)
    np.testing.assert_allclose(restored.omega, car.omega, atol=1e-5)
    # stepping both should stay close
    a = step(apply_action(car, jnp.array([0.1, 0.5, 0.0])), ROAD)
    b = step(apply_action(restored, jnp.array([0.1, 0.5, 0.0])), ROAD)
    np.testing.assert_allclose(a.pos, b.pos, atol=1e-3)


def test_vmap_batch():
    cars = jax.vmap(create)(jnp.zeros(8), jnp.arange(8.0), jnp.zeros(8))
    actions = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (8, 1))
    stepped = jax.vmap(lambda c, a: step(apply_action(c, a), ROAD))(cars, actions)
    assert stepped.pos.shape == (8, 2)
    assert bool(jnp.all(jnp.isfinite(stepped.pos)))
