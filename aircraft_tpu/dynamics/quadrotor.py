"""Quadrotor smoke-test plant (RPG time-optimal simplification).

Cheap fake plant for exercising the OCP stack without aero-data artifacts —
same role as the reference Quadrotor (reference
src/aircraft/dynamics/quadrotor.py): unit mass, identity inertia, four
thrusts, z-axis thrust sum, fixed mixer moments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from aircraft_tpu.dynamics import base

CONTROL_DIM = 4


@struct.dataclass
class QuadrotorParams:
    mass: jax.Array
    inertia: jax.Array
    gravity: jax.Array

    @classmethod
    def default(cls, dtype=jnp.float32) -> "QuadrotorParams":
        return cls(
            mass=jnp.asarray(1.0, dtype),
            inertia=jnp.eye(3, dtype=dtype),
            gravity=jnp.asarray([0.0, 0.0, 9.81], dtype),
        )


def forces_frd(params: QuadrotorParams, x: jax.Array, u: jax.Array) -> jax.Array:
    total = jnp.sum(u, axis=-1)
    zeros = jnp.zeros_like(total)
    return jnp.stack([zeros, zeros, total], axis=-1)


def moments_frd(params: QuadrotorParams, x: jax.Array, u: jax.Array) -> jax.Array:
    t0, t1, t2, t3 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    return jnp.stack(
        [
            t0 - t1 - t2 + t3,
            -t0 - t1 + t2 + t3,
            0.5 * (t0 - t1 + t2 - t3),
        ],
        axis=-1,
    )


def state_derivative(params: QuadrotorParams, x: jax.Array, u: jax.Array) -> jax.Array:
    return base.rigid_body_derivative(
        x,
        forces_frd(params, x, u),
        moments_frd(params, x, u),
        params.mass,
        params.inertia,
        params.gravity,
    )


base.state_derivative.register(QuadrotorParams, state_derivative)
base.control_dim.register(QuadrotorParams, lambda p: CONTROL_DIM)
