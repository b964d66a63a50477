"""Functional PID controllers and ring-buffer filters.

Replaces the stateful `simple_pid.PID` objects used by the reference
controllers (`/root/reference/utils/functions.py:4`,
`generateData/generateParallelTraj.py:41-42`) with explicit-state pure
functions that thread through `lax.scan`.

simple-pid semantics reproduced: error = setpoint - input, integral
accumulates Ki*e*dt, derivative acts on the measurement. One deliberate
divergence (improvement, documented): the reference uses wall-clock dt
(nondeterministic); we use the fixed sim tick dt = 1/50.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

F32 = jnp.float32


class PIDParams(NamedTuple):
    kp: jax.Array
    ki: jax.Array
    kd: jax.Array
    setpoint: jax.Array


class PIDState(NamedTuple):
    integral: jax.Array
    last_input: jax.Array
    initialized: jax.Array  # bool


def pid_params(kp, ki, kd, setpoint=0.0) -> PIDParams:
    return PIDParams(*[jnp.asarray(v, F32) for v in (kp, ki, kd, setpoint)])


def pid_init() -> PIDState:
    return PIDState(jnp.asarray(0.0, F32), jnp.asarray(0.0, F32),
                    jnp.asarray(False))


def pid_update(p: PIDParams, s: PIDState, value, dt=1.0 / 50.0):
    """Returns (output, new_state)."""
    value = jnp.asarray(value, F32)
    error = p.setpoint - value
    d_input = jnp.where(s.initialized, value - s.last_input, 0.0)
    integral = s.integral + p.ki * error * dt
    derivative = -p.kd * d_input / dt
    output = p.kp * error + integral + derivative
    return output, PIDState(integral, value, jnp.asarray(True))


class RingBuffer(NamedTuple):
    """Fixed-length moving-average buffer (the reference's zero-initialized
    deques, generateParallelTraj.py:31-33)."""

    buf: jax.Array  # (N,)


def ring_init(n: int) -> RingBuffer:
    return RingBuffer(jnp.zeros(n, F32))


def ring_push(r: RingBuffer, value) -> RingBuffer:
    return RingBuffer(jnp.roll(r.buf, -1).at[-1].set(jnp.asarray(value, F32)))


def ring_mean(r: RingBuffer) -> jax.Array:
    return jnp.mean(r.buf)
