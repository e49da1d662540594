"""Fixed-wing aircraft dynamics as pure JAX functions.

Re-designs the reference `Aircraft(SixDOF)` symbolic class (reference
src/aircraft/dynamics/aircraft.py) as a params pytree + pure functions.
The whole pipeline — wind-relative flow, per-surface effective angles,
coefficient model (incl. the neural surrogate), forces/moments, Newton–Euler
— is one traced expression that XLA fuses; `jax.jacfwd/jacrev` provide the
exact derivatives that CasADi's AD supplied in the reference.

Control layout (reference aircraft.py:143-166):
    u = [aileron, elevator, rudder, thrust(3), flaps]          -> 7
Trim variant appends the CoM offset (reference aircraft.py:332-373):
    u = [..., com(3)]                                          -> 10
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from aircraft_tpu.config import RHO, AircraftConfig
from aircraft_tpu.dynamics import base
from aircraft_tpu.dynamics.base import QUAT, VEL, OMEGA
from aircraft_tpu.dynamics.coefficients import (
    AeroState,
    DefaultCoeffParams,
    apply_coefficients,
)
from aircraft_tpu.ops import quaternion as quat

CONTROL_DIM = 7
TRIM_CONTROL_DIM = 10

AILERON, ELEVATOR, RUDDER = 0, 1, 2
THRUST = slice(3, 6)
FLAPS = 6
COM = slice(7, 10)

# flap increments (reference aircraft.py:296-300)
C_Z_FLAPS = -0.6
C_D_FLAPS = -0.1


@struct.dataclass
class AircraftParams:
    """Geometry, inertia and aero-model parameters of the glider plant."""

    mass: jax.Array
    S: jax.Array               # reference area
    b: jax.Array               # span
    c: jax.Array               # chord
    com: jax.Array             # (3,) aero-centre offset from body origin
    static_inertia: jax.Array  # (3, 3) incl. Ixz cross term
    rudder_moment_arm: jax.Array
    gravity: jax.Array
    coeff: object              # coefficient-model params pytree (see coefficients.py)
    epsilon: float = 1e-6
    # static (trace-time) switches
    stall_scaling: bool = struct.field(pytree_node=False, default=False)
    thrust_enabled: bool = struct.field(pytree_node=False, default=False)
    com_in_control: bool = struct.field(pytree_node=False, default=False)
    # moment composition convention.  True (default): moments about the CoM
    # include the aero force's arm, m = m_aero + com × F — the textbook
    # composition given the JSON's documented meaning of aero_centre_offset
    # ('position of aerodynamic centre relative to the centre of mass',
    # reference utils.py:208).  False: the REFERENCE'S OWN convention — its
    # moments are the bare coefficient products (reference
    # aircraft.py:325-330 has no cross term; the offset enters only the
    # parallel-axis inertia, :175-177), i.e. the fitted data's Cm is
    # treated as already about the CoM.  The conventions diverge by
    # com×F ≈ 10 N·m at cruise (vs an aero-moment scale of ~5), which is
    # decisive for fitted artifacts with weak pitch authority: measured on
    # the affine model, the arm term leaves a γ≈40° dive as the ONLY
    # equilibrium and every level start departs, while under the
    # reference's convention the same artifact trims at L/D 2.2 and the
    # ablation grid case converges cleanly (viol 0.0 from the JSON start).
    com_in_moments: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def from_config(
        cls,
        config: AircraftConfig,
        coeff=None,
        *,
        stall_scaling: bool = False,
        thrust_enabled: bool = False,
        com_in_control: bool = False,
        com_in_moments: bool = True,
        dtype=jnp.float32,
    ) -> "AircraftParams":
        return cls(
            mass=jnp.asarray(config.mass, dtype),
            S=jnp.asarray(config.reference_area, dtype),
            b=jnp.asarray(config.span, dtype),
            c=jnp.asarray(config.chord, dtype),
            com=jnp.asarray(config.aero_centre_offset, dtype),
            static_inertia=jnp.asarray(config.static_inertia, dtype),
            rudder_moment_arm=jnp.asarray(config.rudder_moment_arm, dtype),
            gravity=jnp.asarray([0.0, 0.0, 9.81], dtype),
            coeff=coeff if coeff is not None else DefaultCoeffParams(),
            stall_scaling=stall_scaling,
            thrust_enabled=thrust_enabled,
            com_in_control=com_in_control,
            com_in_moments=com_in_moments,
        )

    @property
    def control_dim(self) -> int:
        return TRIM_CONTROL_DIM if self.com_in_control else CONTROL_DIM


def effective_com(params: AircraftParams, u: jax.Array) -> jax.Array:
    """CoM offset — a decision variable in the trim variant."""
    if params.com_in_control:
        return u[..., COM]
    return jnp.broadcast_to(params.com, u.shape[:-1] + (3,))


def v_frd_rel(params: AircraftParams, x: jax.Array, u: jax.Array, wind=None) -> jax.Array:
    """Wind-relative velocity in the body (FRD) frame via the quaternion
    sandwich, with the reference's epsilon regularisation added per
    component (reference base.py:147-162)."""
    vel = x[..., VEL]
    if wind is not None:
        vel = vel + wind
    return quat.rotate_inv(x[..., QUAT], vel) + params.epsilon


def aero_state(params: AircraftParams, x: jax.Array, u: jax.Array, wind=None) -> AeroState:
    """All flow quantities feeding the coefficient models
    (reference base.py:164-241 + aircraft.py:189-253).

    Per-surface corrections:
      * elevator alpha is pitch-rate shifted by the tail arm
      * wing alphas are roll-rate shifted by ±b/4
      * rudder beta is yaw-rate shifted by the tail arm
      * wing qbar uses u + b·r/4 for both wings — replicated verbatim from
        the reference (aircraft.py:235-253), including the identical sign
        for left and right, for solution parity.
    """
    eps = params.epsilon
    v_rel = v_frd_rel(params, x, u, wind)
    uu, vv, ww = v_rel[..., 0], v_rel[..., 1], v_rel[..., 2]
    omega = x[..., OMEGA]
    p, q, r = omega[..., 0], omega[..., 1], omega[..., 2]

    airspeed = jnp.sqrt(uu * uu + vv * vv + ww * ww + eps)
    alpha = jnp.arctan2(ww, uu + eps)
    beta = jnp.arcsin(jnp.clip(vv / airspeed, -1.0, 1.0))
    qbar = 0.5 * RHO * (uu * uu + vv * vv + ww * ww)

    arm = params.rudder_moment_arm
    elevator_alpha = jnp.arctan2(ww + arm * q, uu + eps)
    left_wing_alpha = jnp.arctan2(ww - params.b * p / 4.0, uu + eps)
    right_wing_alpha = jnp.arctan2(ww + params.b * p / 4.0, uu + eps)

    v_rud = vv - arm * r
    airspeed_rud = jnp.sqrt(uu * uu + v_rud * v_rud + ww * ww + eps)
    rudder_beta = jnp.arcsin(jnp.clip(v_rud / airspeed_rud, -1.0, 1.0))

    u_wing = uu + params.b * r / 4.0
    wing_qbar = 0.5 * RHO * u_wing * u_wing

    return AeroState(
        qbar=qbar,
        alpha=alpha,
        beta=beta,
        omega=omega,
        elevator_alpha=elevator_alpha,
        left_wing_alpha=left_wing_alpha,
        right_wing_alpha=right_wing_alpha,
        left_wing_qbar=wing_qbar,
        right_wing_qbar=wing_qbar,
        rudder_beta=rudder_beta,
    )


def coefficients(params: AircraftParams, x: jax.Array, u: jax.Array, wind=None) -> jax.Array:
    """Six aero coefficients [CX, CY, CZ, Cl, Cm, Cn] after stall scaling and
    flap increments (reference aircraft.py:255-307)."""
    aero = aero_state(params, x, u, wind)
    out = apply_coefficients(
        params.coeff, aero, u[..., AILERON], u[..., ELEVATOR], u[..., RUDDER]
    )

    if params.stall_scaling:
        stall_angle = np.deg2rad(30.0)
        steepness = 10.0
        alpha_scale = jax.nn.sigmoid(-steepness * (jnp.abs(aero.alpha) - stall_angle))
        beta_scale = jax.nn.sigmoid(-steepness * (jnp.abs(aero.beta) - stall_angle))
        out = out.at[..., 2].multiply(alpha_scale * beta_scale)
        out = out.at[..., 4].multiply(alpha_scale)

    flaps = u[..., FLAPS]
    out = out.at[..., 0].add(C_D_FLAPS * flaps)
    out = out.at[..., 2].add(C_Z_FLAPS * flaps)
    return out


def forces_frd(params: AircraftParams, x: jax.Array, u: jax.Array, wind=None) -> jax.Array:
    """Body-frame aero forces C·q̄·S with the drag component anti-aligned to
    the relative flow (reference aircraft.py:309-322)."""
    coeffs = coefficients(params, x, u, wind)
    aero = aero_state(params, x, u, wind)
    f = coeffs[..., :3] * (aero.qbar * params.S)[..., None]
    u_rel = v_frd_rel(params, x, u, wind)[..., 0]
    f = f.at[..., 0].multiply(jnp.sign(u_rel))
    if params.thrust_enabled:
        f = f + u[..., THRUST]
    return f


def moments_frd(params: AircraftParams, x: jax.Array, u: jax.Array, wind=None) -> jax.Array:
    """Aero moments C·q̄·S·[b, c, b] plus the moment of the aero force about
    the CoM (reference aircraft.py:324-330, base.py:254-278)."""
    coeffs = coefficients(params, x, u, wind)
    aero = aero_state(params, x, u, wind)
    scale = (aero.qbar * params.S)[..., None] * jnp.stack(
        [params.b, params.c, params.b], axis=-1
    )
    m_aero = coeffs[..., 3:] * scale
    if not params.com_in_moments:
        # reference parity: coefficients already about the CoM (see
        # AircraftParams.com_in_moments)
        return m_aero
    f = forces_frd(params, x, u, wind)
    return m_aero + jnp.cross(effective_com(params, u), f)


def state_derivative(params: AircraftParams, x: jax.Array, u: jax.Array, wind=None) -> jax.Array:
    """Full 13-state derivative; one fused expression for XLA
    (reference base.py:385-406)."""
    f = forces_frd(params, x, u, wind)
    m = moments_frd(params, x, u, wind)
    inertia = base.inertia_about_com(params.static_inertia, params.mass, effective_com(params, u))
    return base.rigid_body_derivative(x, f, m, params.mass, inertia, params.gravity)


base.state_derivative.register(
    AircraftParams, lambda p, x, u: state_derivative(p, x, u)
)
base.control_dim.register(AircraftParams, lambda p: p.control_dim)
