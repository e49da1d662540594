"""Generic 6-DoF rigid-body pieces shared by all plants.

The reference implements this as a lazily-built symbolic class hierarchy
(reference src/aircraft/dynamics/base.py); here everything is a pure
function over (state, control, params) arrays so it vmaps over scenario
batches and jits into a single XLA program.

State layout (matches reference base.py:84-106):
    x = [p_ned(3), v_ned(3), q_frd_ned(4, xyzw), omega_frd(3)]  -> 13
NED frame: z is DOWN, gravity = [0, 0, +9.81].
"""

from __future__ import annotations

from functools import singledispatch
from typing import Any

import jax
import jax.numpy as jnp

from aircraft_tpu.ops import quaternion as quat

STATE_DIM = 13
POS = slice(0, 3)
VEL = slice(3, 6)
QUAT = slice(6, 10)
OMEGA = slice(10, 13)

GRAVITY = jnp.array([0.0, 0.0, 9.81])


def position(x: jax.Array) -> jax.Array:
    return x[..., POS]


def velocity(x: jax.Array) -> jax.Array:
    return x[..., VEL]


def orientation(x: jax.Array) -> jax.Array:
    return x[..., QUAT]


def angular_velocity(x: jax.Array) -> jax.Array:
    return x[..., OMEGA]


def pack_state(p, v, q, omega) -> jax.Array:
    return jnp.concatenate([p, v, q, omega], axis=-1)


def normalize_quaternion_state(x: jax.Array) -> jax.Array:
    """Renormalise the quaternion block of a state vector."""
    q = quat.normalize(x[..., QUAT])
    return jnp.concatenate([x[..., POS], x[..., VEL], q, x[..., OMEGA]], axis=-1)


def inertia_about_com(static_inertia: jax.Array, mass, com: jax.Array) -> jax.Array:
    """Parallel-axis inertia tensor (reference base.py:116-137):
    J = J_static + m * (|r|² I - r rᵀ)."""
    r2 = jnp.sum(com * com, axis=-1)
    eye = jnp.eye(3, dtype=com.dtype)
    return static_inertia + mass * (r2[..., None, None] * eye - com[..., :, None] * com[..., None, :])


def rigid_body_derivative(
    x: jax.Array,
    forces_frd: jax.Array,
    moments_frd: jax.Array,
    mass,
    inertia: jax.Array,
    gravity: jax.Array = GRAVITY,
) -> jax.Array:
    """Newton–Euler 6-DoF derivative given body-frame forces/moments
    (assembles reference base.py:290-406 in one fused expression).

    ṗ = v
    v̇ = R(q) F_frd / m + g
    q̇ = ½ q ⊗ (ω, 0)
    ω̇ = J⁻¹ (M − ω × J ω)
    """
    q = x[..., QUAT]
    omega = x[..., OMEGA]

    p_dot = x[..., VEL]
    v_dot = quat.rotate(q, forces_frd) / mass + gravity
    q_dot = quat.derivative(q, omega)
    J_omega = jnp.einsum("...ij,...j->...i", inertia, omega)
    torque = moments_frd - jnp.cross(omega, J_omega)
    omega_dot = jnp.linalg.solve(inertia, torque[..., None])[..., 0]

    return pack_state(p_dot, v_dot, q_dot, omega_dot)


# ---------------------------------------------------------------------------
# Generic dispatch: every plant registers its params type here, giving one
# framework-wide `state_derivative(params, x, u)` entry point (the role of
# the reference's SixDOF ABC).
# ---------------------------------------------------------------------------


@singledispatch
def state_derivative(params: Any, x: jax.Array, u: jax.Array) -> jax.Array:
    """ẋ = f(x, u; params). Registered per plant-params type."""
    raise TypeError(f"No dynamics registered for params type {type(params)}")


@singledispatch
def control_dim(params: Any) -> int:
    raise TypeError(f"No control dim registered for params type {type(params)}")
