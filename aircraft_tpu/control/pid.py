"""Classical PID attitude control (reference src/aircraft/dynamics/pid.py).

A scalar PID plus a roll/pitch attitude-hold wrapper around the 6-DoF
plant.  Includes a functional, scan-compatible formulation so a whole
PID-controlled episode compiles to one `lax.scan` (the reference's
"PID-in-the-integrator" experiment, pid.py:41-99, done the JAX way).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.ops import quaternion as quat
from aircraft_tpu.solvers import integrators


class PIDState(NamedTuple):
    integral: jax.Array
    prev_error: jax.Array


class PIDGains(NamedTuple):
    kp: float
    ki: float
    kd: float
    limit: float = 5.0


def pid_init(dim: int = 1) -> PIDState:
    return PIDState(integral=jnp.zeros(dim), prev_error=jnp.zeros(dim))


def pid_step(gains: PIDGains, state: PIDState, error: jax.Array, dt) -> tuple[jax.Array, PIDState]:
    """One PID update; returns (output, new_state). Anti-windup by clamping
    the integral to the output limit."""
    integral = jnp.clip(
        state.integral + error * dt, -gains.limit / max(gains.ki, 1e-9),
        gains.limit / max(gains.ki, 1e-9),
    )
    deriv = (error - state.prev_error) / dt
    out = gains.kp * error + gains.ki * integral + gains.kd * deriv
    out = jnp.clip(out, -gains.limit, gains.limit)
    return out, PIDState(integral=integral, prev_error=error)


class AttitudePIDState(NamedTuple):
    roll: PIDState
    pitch: PIDState


def attitude_pid_init() -> AttitudePIDState:
    return AttitudePIDState(roll=pid_init(), pitch=pid_init())


DEFAULT_ROLL_GAINS = PIDGains(kp=2.0, ki=0.1, kd=0.5)
DEFAULT_PITCH_GAINS = PIDGains(kp=4.0, ki=0.2, kd=1.0)


def attitude_pid_control(
    x: jax.Array,
    pid_state: AttitudePIDState,
    roll_target,
    pitch_target,
    dt,
    roll_gains: PIDGains = DEFAULT_ROLL_GAINS,
    pitch_gains: PIDGains = DEFAULT_PITCH_GAINS,
) -> tuple[jax.Array, AttitudePIDState]:
    """Roll/pitch hold: aileron from roll error, elevator from pitch error
    (reference PIDAircraft loops)."""
    eul = quat.to_euler(x[..., 6:10])
    roll_err = jnp.atleast_1d(roll_target - eul[..., 0])
    pitch_err = jnp.atleast_1d(pitch_target - eul[..., 1])
    aileron, roll_state = pid_step(roll_gains, pid_state.roll, roll_err, dt)
    elevator, pitch_state = pid_step(pitch_gains, pid_state.pitch, pitch_err, dt)
    u = jnp.zeros(x.shape[:-1] + (7,), dtype=x.dtype)
    u = u.at[..., 0].set(aileron[..., 0]).at[..., 1].set(-elevator[..., 0])
    return u, AttitudePIDState(roll=roll_state, pitch=pitch_state)


def simulate_pid(
    params: AircraftParams,
    x0: jax.Array,
    roll_targets: jax.Array,   # (T,)
    pitch_targets: jax.Array,  # (T,)
    dt: float,
    substeps: int = 5,
) -> tuple[jax.Array, jax.Array]:
    """Closed-loop PID episode as one scan: returns (states (T+1, 13),
    controls (T, 7))."""
    step = integrators.make_step_fn(params, substeps=substeps, normalize="step")

    def body(carry, targets):
        x, pid_state = carry
        u, pid_state = attitude_pid_control(x, pid_state, targets[0], targets[1], dt)
        x_next = step(x, u, dt)
        return (x_next, pid_state), (x_next, u)

    (_, _), (xs, us) = jax.lax.scan(
        body, (x0, attitude_pid_init()),
        jnp.stack([roll_targets, pitch_targets], axis=-1),
    )
    return jnp.concatenate([x0[None], xs], axis=0), us
