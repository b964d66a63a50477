"""Pure-JAX car dynamics: the reference tire model on one analytic rigid body.

Reproduces the per-wheel force model of `/root/reference/envs/car_dynamics.py`
(`Car.step`, lines 227-321) and the Box2D world integration it feeds
(`world.Step`, `/root/reference/envs/car_racing.py:456`) as a single
jit/vmap-friendly function over an explicit state pytree.

Design notes (TPU-first, not a port):
- The reference's five Box2D bodies are rigidly joined and the road tiles are
  sensors, so the assembly is one rigid body; forces/torques are summed about
  the assembly COM and integrated with the same semi-implicit Euler scheme
  Box2D uses (v += dt*F/m then x += dt*v).
- The steering revolute joint's motor (`motorSpeed = sign*min(50|err|, 3)`,
  car_dynamics.py:230-232) always achieves its speed within a step (the wheel's
  rotational inertia is ~0.007 against 32.4 N*m of motor torque), so the joint
  angle integrates exactly: angle += motorSpeed*dt, clamped to +-0.4.
- All per-wheel math is vectorized over the 4 wheels; the whole function
  vmaps over thousands of envs.

State is an explicit pytree, so snapshot/restore (the reference's
`_save_state/_restore_state`, car_dynamics.py:138-196) is free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import constants as C


class CarState(NamedTuple):
    """State of one car. All arrays fp32; leading batch dims allowed via vmap.

    Mirrors the reference's saved state layout (car_dynamics.py:138-178):
    hull position (body origin), angle, linear velocity, angular velocity,
    plus per-wheel [gas, brake, steer, joint_angle, phase, omega].
    """

    pos: jax.Array          # (2,) hull body-origin, world frame
    angle: jax.Array        # () hull angle
    vel: jax.Array          # (2,) velocity of the hull COM assembly (world)
    angular_vel: jax.Array  # ()
    gas: jax.Array          # (4,) per-wheel gas (only rear wheels driven)
    brake: jax.Array        # (4,)
    steer: jax.Array        # (4,) steer target (only front wheels steered)
    joint_angle: jax.Array  # (4,) current steering joint angle
    phase: jax.Array        # (4,) wheel roll angle (rendering)
    omega: jax.Array        # (4,) wheel rolling angular velocity
    fuel_spent: jax.Array   # ()


def create(init_angle, init_x, init_y) -> CarState:
    """Car at rest, matching `Car.__init__` (car_dynamics.py:51-136)."""
    f32 = jnp.float32
    return CarState(
        pos=jnp.array([init_x, init_y], f32),
        angle=jnp.asarray(init_angle, f32),
        vel=jnp.zeros(2, f32),
        angular_vel=jnp.asarray(0.0, f32),
        gas=jnp.zeros(4, f32),
        brake=jnp.zeros(4, f32),
        steer=jnp.zeros(4, f32),
        joint_angle=jnp.zeros(4, f32),
        phase=jnp.zeros(4, f32),
        omega=jnp.zeros(4, f32),
        fuel_spent=jnp.asarray(0.0, f32),
    )


def apply_gas(car: CarState, gas) -> CarState:
    """Rear-wheel drive with +0.1/step ramp-up (car_dynamics.py:198-209)."""
    gas = jnp.clip(jnp.asarray(gas, jnp.float32), 0.0, 1.0)
    diff = gas - car.gas
    diff = jnp.minimum(diff, C.GAS_RAMP)  # gradual increase, instant decrease
    rear = jnp.array([0.0, 0.0, 1.0, 1.0], jnp.float32)
    return car._replace(gas=car.gas + diff * rear)


def apply_brake(car: CarState, b) -> CarState:
    """All wheels brake (car_dynamics.py:211-217)."""
    return car._replace(brake=jnp.broadcast_to(jnp.asarray(b, jnp.float32), (4,)))


def apply_steer(car: CarState, s) -> CarState:
    """Front wheels get the steering target (car_dynamics.py:219-225)."""
    front = jnp.array([1.0, 1.0, 0.0, 0.0], jnp.float32)
    return car._replace(steer=jnp.asarray(s, jnp.float32) * front)


def apply_action(car: CarState, action) -> CarState:
    """Reference action convention: steer(-a0), gas(a1), brake(a2)
    (car_racing.py:449-453)."""
    car = apply_steer(car, -action[0])
    car = apply_gas(car, action[1])
    return apply_brake(car, action[2])


def _rot(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def step(car: CarState, friction_limit: jax.Array, dt: float = C.DT) -> CarState:
    """One physics tick: `Car.step(dt)` + `world.Step(dt, ...)`.

    Args:
      car: current state.
      friction_limit: (4,) per-wheel tire force limit. The env computes this
        from track contact: on-road -> FRICTION_LIMIT * road_friction, grass ->
        0.6 * FRICTION_LIMIT (car_dynamics.py:235-241).
      dt: tick length (1/50 s).
    """
    f32 = jnp.float32
    dt = jnp.asarray(dt, f32)

    # --- steering servo speed from current joint angles (:230-232) ---
    steer_err = car.steer - car.joint_angle
    motor_speed = jnp.sign(steer_err) * jnp.minimum(
        C.STEER_RATE_GAIN * jnp.abs(steer_err), C.STEER_RATE_MAX
    )

    # --- wheel kinematics: world directions and contact-point velocity ---
    wheel_world_angle = car.angle + car.joint_angle            # (4,)
    cos_w, sin_w = jnp.cos(wheel_world_angle), jnp.sin(wheel_world_angle)
    # Box2D GetWorldVector((0,1)) / ((1,0)) for body at angle a:
    forw = jnp.stack([-sin_w, cos_w], axis=-1)                 # (4,2)
    side = jnp.stack([cos_w, sin_w], axis=-1)                  # (4,2)

    rot = _rot(car.angle)                                       # (2,2)
    com_world = car.pos + rot @ jnp.asarray(C.COM_BODY, f32)    # (2,)
    wheel_world = car.pos + (jnp.asarray(C.WHEEL_POSITIONS, f32) @ rot.T)  # (4,2)
    r = wheel_world - com_world                                 # (4,2)
    # rigid-body velocity at each wheel anchor: v + w x r
    v_wheel = car.vel + car.angular_vel * jnp.stack([-r[:, 1], r[:, 0]], axis=-1)

    vf = jnp.sum(forw * v_wheel, axis=-1)                       # forward speed
    vs = jnp.sum(side * v_wheel, axis=-1)                       # side speed

    # --- engine (:255-262) ---
    omega = car.omega + dt * C.ENGINE_POWER * car.gas / C.WHEEL_MOMENT_OF_INERTIA / (
        jnp.abs(car.omega) + C.ENGINE_OMEGA_BIAS
    )
    fuel_spent = car.fuel_spent + dt * C.ENGINE_POWER * jnp.sum(car.gas)

    # --- brake (:264-272): >=0.9 locks the wheel, else rate-limited decay ---
    val = jnp.minimum(C.BRAKE_FORCE * car.brake, jnp.abs(omega))
    omega_braked = omega - jnp.sign(omega) * val
    omega = jnp.where(car.brake >= 0.9, 0.0, jnp.where(car.brake > 0.0, omega_braked, omega))

    phase = car.phase + omega * dt

    # --- slip forces clamped to the friction circle (:275-311) ---
    vr = omega * C.WHEEL_RAD
    f_force = (-vf + vr) * C.SLIP_FORCE_COEF
    p_force = -vs * C.SLIP_FORCE_COEF
    force = jnp.sqrt(f_force**2 + p_force**2)
    over = force > friction_limit
    scale = jnp.where(over, friction_limit / jnp.maximum(force, 1e-9), 1.0)
    f_force = f_force * scale
    p_force = p_force * scale

    omega = omega - dt * f_force * C.WHEEL_RAD / C.WHEEL_MOMENT_OF_INERTIA

    # --- accumulate assembly wrench and integrate (world.Step) ---
    f_world = p_force[:, None] * side + f_force[:, None] * forw  # (4,2)
    f_total = jnp.sum(f_world, axis=0)
    torque = jnp.sum(r[:, 0] * f_world[:, 1] - r[:, 1] * f_world[:, 0])

    vel = car.vel + dt * f_total / C.TOTAL_MASS
    angular_vel = car.angular_vel + dt * torque / C.TOTAL_I

    # Box2D clamps per-step motion and keeps the scaled-back velocity
    # (b2Island::Solve with b2_maxTranslation=2, b2_maxRotation=pi/2) — a
    # hard 100 u/s speed cap at dt=1/50 that the reference car reaches at
    # full throttle.
    translation = jnp.sqrt(jnp.sum(vel * vel)) * dt
    vel = vel * jnp.where(translation > C.MAX_TRANSLATION,
                          C.MAX_TRANSLATION / jnp.maximum(translation, 1e-9),
                          1.0)
    rotation = jnp.abs(angular_vel) * dt
    angular_vel = angular_vel * jnp.where(
        rotation > C.MAX_ROTATION,
        C.MAX_ROTATION / jnp.maximum(rotation, 1e-9), 1.0)

    com_world_new = com_world + dt * vel
    angle = car.angle + dt * angular_vel
    pos = com_world_new - _rot(angle) @ jnp.asarray(C.COM_BODY, f32)

    # --- steering joint advances at motor speed, clamped to the limits ---
    joint_angle = jnp.clip(
        car.joint_angle + motor_speed * dt, -C.JOINT_LIMIT, C.JOINT_LIMIT
    )

    return CarState(
        pos=pos, angle=angle, vel=vel, angular_vel=angular_vel,
        gas=car.gas, brake=car.brake, steer=car.steer,
        joint_angle=joint_angle, phase=phase, omega=omega,
        fuel_spent=fuel_spent,
    )


def hull_com_velocity(car: CarState) -> jax.Array:
    """Velocity of the hull's own COM — what the reference exposes as
    `car.hull.linearVelocity` (used in step() info, car_racing.py:479)."""
    rot = _rot(car.angle)
    hull_com_world = car.pos + rot @ jnp.asarray(C.HULL_COM, jnp.float32)
    com_world = car.pos + rot @ jnp.asarray(C.COM_BODY, jnp.float32)
    r = hull_com_world - com_world
    return car.vel + car.angular_vel * jnp.stack([-r[1], r[0]])


def save_state(car: CarState) -> jax.Array:
    """Flat (30,) vector in the reference's `_save_state` ordering
    (car_dynamics.py:138-178): 6 hull scalars + 4x[wheel_rad,gas,brake,steer,
    phase,omega]."""
    hull_v = hull_com_velocity(car)
    wheels = jnp.stack(
        [
            jnp.full(4, C.WHEEL_RAD, jnp.float32),
            car.gas, car.brake, car.steer, car.phase, car.omega,
        ],
        axis=-1,
    )  # (4,6)
    head = jnp.stack([car.pos[0], car.pos[1], car.angle, hull_v[0], hull_v[1],
                      car.angular_vel])
    return jnp.concatenate([head, wheels.reshape(-1)])


def restore_state(saved: jax.Array) -> CarState:
    """Inverse of `save_state` (reference `_restore_state`,
    car_dynamics.py:180-196). Joint angles reset to the steer targets."""
    saved = jnp.asarray(saved, jnp.float32)
    wheels = saved[6:].reshape(4, 6)
    return CarState(
        pos=saved[0:2],
        angle=saved[2],
        vel=saved[3:5],
        angular_vel=saved[5],
        gas=wheels[:, 1],
        brake=wheels[:, 2],
        steer=wheels[:, 3],
        joint_angle=wheels[:, 3] * jnp.array([1, 1, 0, 0], jnp.float32),
        phase=wheels[:, 4],
        omega=wheels[:, 5],
        fuel_spent=jnp.asarray(0.0, jnp.float32),
    )
