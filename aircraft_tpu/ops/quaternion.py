"""Pure-JAX quaternion algebra in **xyzw** (scalar-last) convention.

The reference stack keeps orientation as a unit quaternion q_frd_ned with
coefficients ordered [x, y, z, w] (liecasadi convention; see reference
src/aircraft/dynamics/base.py:181-195 where Euler angles unpack
``x, y, z, w = vertsplit(q)``).  All functions here are shape-polymorphic:
they operate on the last axis and broadcast over leading batch axes, so they
can be freely ``vmap``-ed / ``jit``-ed and fused by XLA.

Conventions
-----------
* Hamilton product, scalar-last storage.
* ``rotate(q, v)`` applies the frame rotation q * (v,0) * q^-1 — for
  q = q_frd_ned this maps body-frame (FRD) vectors into NED.
* ``rotate_inv(q, v)`` is the inverse sandwich q^-1 * (v,0) * q (NED -> FRD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "multiply",
    "conjugate",
    "inverse",
    "normalize",
    "rotate",
    "rotate_inv",
    "to_rotation_matrix",
    "from_axis_angle",
    "expmap",
    "logmap",
    "integrate_expmap",
    "derivative",
    "to_euler",
    "from_euler",
    "identity",
    "slerp",
]


def identity(dtype=jnp.float32) -> jax.Array:
    """Identity rotation [0, 0, 0, 1]."""
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2, xyzw storage, broadcasting over batch axes."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def conjugate(q: jax.Array) -> jax.Array:
    """Quaternion conjugate [-x, -y, -z, w]."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def inverse(q: jax.Array) -> jax.Array:
    """Quaternion inverse conj(q) / |q|^2 (== conjugate for unit q)."""
    return conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Project onto the unit sphere."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / norm


def rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by q:  q * (v, 0) * q^-1  (body -> world for q_frd_ned).

    Uses the expanded Rodrigues form (no intermediate quaternion products):
    v' = v + 2 w (u × v) + 2 u × (u × v), u = q.xyz — cheaper and
    XLA-friendlier than two Hamilton products.
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate by the inverse of q:  q^-1 * (v, 0) * q  (world -> body)."""
    return rotate(conjugate(q), v)


def to_rotation_matrix(q: jax.Array) -> jax.Array:
    """3x3 rotation matrix R such that R @ v == rotate(q, v)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def derivative(q: jax.Array, omega_body: jax.Array) -> jax.Array:
    """Kinematic quaternion derivative q̇ = ½ q ⊗ (ω, 0).

    Matches the reference body-rate convention (reference dynamics/base.py:
    290-297): ω is expressed in the body (FRD) frame and multiplies on the
    right.
    """
    omega_q = jnp.concatenate(
        [omega_body, jnp.zeros_like(omega_body[..., :1])], axis=-1
    )
    return 0.5 * multiply(q, omega_q)


def from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit quaternion for a rotation of `angle` radians about unit `axis`."""
    half = 0.5 * angle[..., None] if jnp.ndim(angle) == jnp.ndim(axis) - 1 else 0.5 * angle
    half = jnp.broadcast_to(half, axis[..., :1].shape)
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def expmap(phi: jax.Array) -> jax.Array:
    """Exponential map so(3) -> S3:  exp(phi) with phi a rotation vector.

    Taylor-safe near zero (sin(θ/2)/θ -> 1/2), so it is differentiable
    everywhere — no data-dependent branching, unlike the reference's
    ``ca.if_else`` guard (reference dynamics/base.py:317-342).
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq + 1e-24)
    half = 0.5 * theta
    # sin(θ/2)/θ, series-expanded for small θ: 1/2 - θ²/48 + ...
    small = theta_sq < 1e-12
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    return jnp.concatenate([k * phi, jnp.cos(half)], axis=-1)


def logmap(q: jax.Array) -> jax.Array:
    """Log map S3 -> so(3): the rotation vector of q (inverse of `expmap`).

    Sign-canonicalised to the shortest rotation (angle in [0, pi]) and
    Taylor-safe near the identity, so it is differentiable everywhere —
    the tangent-space chart used by the error-state LQR and trim solvers.
    """
    q = q * jnp.sign(jnp.where(q[..., 3:4] == 0.0, 1.0, q[..., 3:4]))
    vec = q[..., :3]
    w = q[..., 3:4]
    n_sq = jnp.sum(vec * vec, axis=-1, keepdims=True)
    n = jnp.sqrt(n_sq + 1e-24)
    theta = 2.0 * jnp.arctan2(n, w)
    # theta / n, series-expanded for small n: 2/w * (1 - n^2/(3 w^2) + ...)
    small = n_sq < 1e-12
    w_safe = jnp.maximum(w, 1e-6)
    k = jnp.where(small, 2.0 / w_safe * (1.0 - n_sq / (3.0 * w_safe * w_safe)),
                  theta / n)
    return k * vec


def integrate_expmap(q: jax.Array, omega_body: jax.Array, dt) -> jax.Array:
    """Exact-on-SO(3) quaternion update: q⁺ = exp(ω dt) ⊗ q.

    Norm-preserving by construction — the TPU-native answer to quaternion
    drift (one of the four strategies the reference ablates).
    """
    dt_arr = jnp.asarray(dt)[..., None] if jnp.ndim(jnp.asarray(dt)) < jnp.ndim(omega_body) else jnp.asarray(dt)
    return multiply(expmap(omega_body * dt_arr), q)


def to_euler(q: jax.Array) -> jax.Array:
    """ZYX (yaw-pitch-roll) Euler angles [phi, theta, psi] from xyzw quaternion.

    Same formulas as the reference Euler-angle accessors
    (reference dynamics/base.py:179-195).
    """
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    phi = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    theta = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    psi = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([phi, theta, psi], axis=-1)


def from_euler(phi, theta, psi) -> jax.Array:
    """xyzw quaternion from ZYX Euler angles (roll, pitch, yaw)."""
    hphi, hth, hpsi = 0.5 * jnp.asarray(phi), 0.5 * jnp.asarray(theta), 0.5 * jnp.asarray(psi)
    cphi, sphi = jnp.cos(hphi), jnp.sin(hphi)
    cth, sth = jnp.cos(hth), jnp.sin(hth)
    cpsi, spsi = jnp.cos(hpsi), jnp.sin(hpsi)
    return jnp.stack(
        [
            sphi * cth * cpsi - cphi * sth * spsi,
            cphi * sth * cpsi + sphi * cth * spsi,
            cphi * cth * spsi - sphi * sth * cpsi,
            cphi * cth * cpsi + sphi * sth * spsi,
        ],
        axis=-1,
    )


def slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical linear interpolation between unit quaternions."""
    t = jnp.asarray(t)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    # fall back to lerp when nearly parallel
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    near = sin_theta < 1e-5
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_theta))
    return normalize(w0 * q0 + w1 * q1)
