"""Aerodynamic reference frames and rotating-Earth fictitious accelerations.

Covers the role of the reference's numpy mirror plant (reference
src/aircraft/dynamics/numpydynamics.py): the stability/wind-frame
transforms (:306-321) and the Earth-rotation Coriolis/centrifugal
contributions (:160-210).  The reference keeps these in a dead-code numpy
class; here they are pure JAX functions so they trace into the same XLA
program as the rest of the plant when enabled, and vmap over scenario
batches.

Notes on physics (intentionally NOT a translation of the reference, whose
fictitious-force block adds un-normalised "forces" to accelerations and
applies Coriolis terms to moments): we implement the standard rotating
NED-frame kinematics,

    a_fict = -2 Ω×v  -  Ω×(Ω×(r_e + p))

with Ω the Earth-rate vector expressed in local NED at geodetic latitude
λ: Ω = ω_e [cos λ, 0, -sin λ] (z down).  This is the textbook form used
in inertial-navigation mechanisations; at glider speeds it is a ~1e-3
m/s² correction, which is why the reference's main plant omits it too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

OMEGA_EARTH = 7.292115e-5  # rad/s (WGS-84 nominal Earth rate)
R_EARTH = 6.371e6          # m (mean radius; spherical-Earth centrifugal arm)


# ---------------------------------------------------------------------------
# stability / wind frames (reference numpydynamics.py:306-321)
# ---------------------------------------------------------------------------


def _rot_y(angle: jax.Array) -> jax.Array:
    """Rotation matrix about body-y by `angle` (batched)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, z, s], axis=-1),
         jnp.stack([z, o, z], axis=-1),
         jnp.stack([-s, z, c], axis=-1)], axis=-2)


def _rot_z(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, -s, z], axis=-1),
         jnp.stack([s, c, z], axis=-1),
         jnp.stack([z, z, o], axis=-1)], axis=-2)


def body_to_stability(vec: jax.Array, alpha: jax.Array) -> jax.Array:
    """Body (FRD) -> stability frame.  The stability x-axis is the body
    x-axis tilted by +alpha toward body-z (the xz-projection of the
    relative airflow), so resolving a body vector in it is R_y(+alpha):
    x_s = u cos(alpha) + w sin(alpha) = V cos(beta)."""
    return jnp.einsum("...ij,...j->...i", _rot_y(alpha), vec)


def stability_to_body(vec: jax.Array, alpha: jax.Array) -> jax.Array:
    return jnp.einsum("...ij,...j->...i", _rot_y(-alpha), vec)


def body_to_wind(vec: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """Body -> wind frame (x-axis along the full relative-airflow vector):
    stability resolution by alpha, then beta about the stability z-axis
    (x_w = x_s cos(beta) + y_s sin(beta) = V)."""
    return jnp.einsum("...ij,...j->...i", _rot_z(-beta), body_to_stability(vec, alpha))


def wind_to_body(vec: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    return stability_to_body(
        jnp.einsum("...ij,...j->...i", _rot_z(beta), vec), alpha)


def body_to_rdf(vec: jax.Array, offset: jax.Array) -> jax.Array:
    """Body -> reference-datum frame: pure translation by `offset`
    (reference numpydynamics.py:324-340 — used for aero-centre /
    control-surface station bookkeeping)."""
    return vec + offset


# ---------------------------------------------------------------------------
# rotating-Earth fictitious accelerations (reference numpydynamics.py:160-210)
# ---------------------------------------------------------------------------


@struct.dataclass
class EarthRotationParams:
    """Local-NED Earth-rotation model at a fixed geodetic latitude."""

    latitude_rad: jax.Array
    omega_earth: jax.Array
    r_earth: jax.Array

    @classmethod
    def at_latitude(cls, latitude_deg: float, dtype=jnp.float32) -> "EarthRotationParams":
        return cls(
            latitude_rad=jnp.asarray(jnp.deg2rad(latitude_deg), dtype),
            omega_earth=jnp.asarray(OMEGA_EARTH, dtype),
            r_earth=jnp.asarray(R_EARTH, dtype),
        )

    @property
    def rate_ned(self) -> jax.Array:
        """Earth-rate vector in local NED: ω_e [cos λ, 0, -sin λ]."""
        lam = self.latitude_rad
        return self.omega_earth * jnp.stack(
            [jnp.cos(lam), jnp.zeros_like(lam), -jnp.sin(lam)], axis=-1)


def coriolis_acceleration(earth: EarthRotationParams, v_ned: jax.Array) -> jax.Array:
    """-2 Ω × v, the Coriolis acceleration seen in the rotating NED frame."""
    return -2.0 * jnp.cross(jnp.broadcast_to(earth.rate_ned, v_ned.shape), v_ned)


def centrifugal_acceleration(earth: EarthRotationParams, p_ned: jax.Array) -> jax.Array:
    """-Ω × (Ω × r) with r the position about the Earth's axis: the local
    vertical arm R_e (pointing UP, i.e. -z in NED) plus the NED offset."""
    up = jnp.zeros_like(p_ned).at[..., 2].set(-earth.r_earth)
    r = up + p_ned
    omega = jnp.broadcast_to(earth.rate_ned, p_ned.shape)
    return -jnp.cross(omega, jnp.cross(omega, r))


def fictitious_acceleration(earth: EarthRotationParams, p_ned: jax.Array,
                            v_ned: jax.Array) -> jax.Array:
    """Total rotating-frame correction to v̇ in NED."""
    return coriolis_acceleration(earth, v_ned) + centrifugal_acceleration(earth, p_ned)


def with_earth_rotation(derivative_fn, earth: EarthRotationParams,
                        include_centrifugal: bool = False):
    """Wrap a `f(params, x, u) -> xdot` plant derivative so its velocity
    block includes the rotating-Earth terms.  Opt-in, exactly like the
    reference keeps these terms out of its main symbolic plant.

    By default only the Coriolis term is added: the plant's gravity
    constant 9.81 m/s^2 is STANDARD (measured) gravity, which already
    contains the centrifugal relief — adding -Omega x (Omega x r) on top
    would subtract it twice (~0.034 cos(lat) m/s^2, the same order as the
    whole correction).  Pass include_centrifugal=True only when the
    wrapped plant uses pure gravitation for its gravity vector."""
    from aircraft_tpu.dynamics import base

    def wrapped(params, x, u, *args, **kwargs):
        xdot = derivative_fn(params, x, u, *args, **kwargs)
        if include_centrifugal:
            a = fictitious_acceleration(earth, x[..., base.POS],
                                        x[..., base.VEL])
        else:
            a = coriolis_acceleration(earth, x[..., base.VEL])
        return xdot.at[..., base.VEL].add(a)

    return wrapped
