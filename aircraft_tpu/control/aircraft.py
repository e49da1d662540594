"""Aircraft trajectory-optimisation problem builders.

The constraint envelope mirrors `AircraftControl` (reference
control/aircraft.py:29-59): control-surface bounds, airspeed window,
sideslip/attack-angle limits, altitude floor.  Costs mirror the flagship
goal-seeking controller (reference main/control/control.py:19-70).

Everything is expressed as `OCPFunctions` for the AL-iLQR solver; the
per-node `ca.Opti` constraint registration of the reference becomes four
pure functions evaluated at every knot by `vmap`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import ControlEnvelope, StateEnvelope, TrajectoryConfig
from aircraft_tpu.dynamics import aircraft as ac
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.solvers import integrators
from aircraft_tpu.solvers.ocp import OCPFunctions


REFERENCE_ENVELOPE = {
    # the reference's OCP envelope is HARD-CODED regardless of the declared
    # state envelope (reference control/aircraft.py:44-59: airspeed^2 in
    # [20^2, 100^2], |alpha| <= 20 deg, |beta| <= 10 deg); controllers that
    # mirror reference behaviour pass these overrides explicitly, while
    # envelope_ineq defaults to honouring the problem JSON's declaration
    "speed_bounds": (20.0, 100.0),
    "alpha_limit_deg": 20.0,
    "beta_limit_deg": 10.0,
}


def envelope_ineq(
    params: AircraftParams,
    state_env: StateEnvelope,
    control_env: ControlEnvelope,
    *,
    speed_bounds: Optional[tuple[float, float]] = None,
    alpha_limit_deg: Optional[float] = None,
    beta_limit_deg: Optional[float] = None,
    unit_scales: bool = False,
    include_control_box: bool = True,
) -> Callable:
    """Stage inequality g(x,u,k) <= 0 bundling the flight envelope.

    Matches the reference's active set (control/aircraft.py:44-59):
    airspeed² window, |β|, |α|, z < 0, plus the control box
    (control/aircraft.py:29-41).  Limits default to the DECLARED state
    envelope of the problem JSON (the reference hard-codes 20–100 m/s /
    |α|≤20° / |β|≤10° regardless of its config — control/aircraft.py:44-59;
    honouring the declaration matters: an unenforced 30 m/s floor lets the
    optimiser drift into the energy-cheaper 20 m/s glide and out of the
    declared envelope).  Pass explicit overrides to reproduce the
    reference's hard-coded set.
    """
    lb, ub = control_env.bounds(7)
    lb = jnp.asarray(lb, jnp.float32)
    ub = jnp.asarray(ub, jnp.float32)
    if speed_bounds is None:
        speed_bounds = (float(state_env.airspeed[0]), float(state_env.airspeed[1]))
    if alpha_limit_deg is None:
        alpha_limit_deg = float(max(abs(state_env.alpha[0]), abs(state_env.alpha[1])))
    if beta_limit_deg is None:
        beta_limit_deg = float(max(abs(state_env.beta[0]), abs(state_env.beta[1])))
    alpha_lim = float(np.deg2rad(alpha_limit_deg))
    beta_lim = float(np.deg2rad(beta_limit_deg))
    lo2, hi2 = speed_bounds[0] ** 2, speed_bounds[1] ** 2
    # unit-consistent row scaling (IPOPT's gradient-based constraint
    # scaling analogue, nlp_scaling_method): the squared-speed rows carry
    # a natural scale of 2·v per m/s of deficit (~40–200× the other rows),
    # so under a UNIFORM AL penalty they are priced 40–200× stiffer per
    # physical unit than the angle/altitude/control rows.  Dividing by the
    # boundary gradient puts every row in comparable physical units
    # (speed rows → m/s of deficit; angles rad; altitude m; controls in
    # their normalized span), which (a) conditions the AL uniformly and
    # (b) makes `max_violation` read as a physically-meaningful tolerance
    # (1e-2 ≈ 1 cm/s of speed, 0.57°, 1 cm).  Opt-in: the course recipe's
    # hardware-validated thresholds were tuned against raw rows.
    lo_scale = 1.0 / (2.0 * speed_bounds[0]) if unit_scales else 1.0
    hi_scale = 1.0 / (2.0 * speed_bounds[1]) if unit_scales else 1.0

    def ineq(x, u, k):
        aero = ac.aero_state(params, x, u)
        v2 = 2.0 * aero.qbar / 1.225
        # box rows omitted when the controller enforces the control box
        # EXACTLY by construction (ocp.squash_controls): keeping them as AL
        # rows is then dead weight — they can never activate
        box = ([u - ub, lb - u] if include_control_box else [])
        return jnp.concatenate(
            box
            + [
                jnp.stack(
                    [
                        (lo2 - v2) * lo_scale,
                        (v2 - hi2) * hi_scale,
                        aero.beta - beta_lim,
                        -beta_lim - aero.beta,
                        aero.alpha - alpha_lim,
                        -alpha_lim - aero.alpha,
                        x[2],  # z < 0 (NED altitude floor)
                    ]
                ),
            ]
        )

    # resolved row parameters, attached for consumers that need the raw
    # numbers rather than the closure (the fused window kernel mirrors
    # these rows in batch-lanes layout — kernels/window_kernel.py).
    # Best-effort: builders invoked under a trace (e.g. the waypoint OCP
    # re-built per traced dt inside a candidate vmap) carry traced bounds
    # that cannot be materialised — those callers never consume .resolved.
    try:
        ineq.resolved = {
            "speed_bounds": (float(speed_bounds[0]), float(speed_bounds[1])),
            "alpha_lim": alpha_lim,
            "beta_lim": beta_lim,
            "lo_scale": float(lo_scale),
            "hi_scale": float(hi_scale),
            "include_control_box": include_control_box,
            "lb": np.asarray(lb, np.float32),
            "ub": np.asarray(ub, np.float32),
        }
    except Exception:
        ineq.resolved = None
    return ineq


def envelope_registry(n_controls: int = 7, *, include_control_box: bool = True):
    """ConstraintRegistry describing `envelope_ineq`'s row layout — maps a
    violation row index back to its meaning (the reference auto-described
    each Opti row, reference control/base.py:228-265; its per-solve log
    printed active constraints BY NAME with duals, control/aircraft.py:120-135).

    ``include_control_box`` must mirror the `envelope_ineq` that built the
    OCP: with the tanh squash (`include_control_box=False`) the 14 box rows
    are absent, and a registry that still listed them would mislabel every
    envelope row (airspeed_floor read as aileron_upper, …)."""
    from aircraft_tpu.observability import ConstraintRegistry

    names = ["aileron", "elevator", "rudder", "thrust_x", "thrust_y",
             "thrust_z", "flaps"][:n_controls]
    reg = ConstraintRegistry()
    if include_control_box:
        for n in names:
            reg.register(f"{n}_upper", 1)
        for n in names:
            reg.register(f"{n}_lower", 1)
    reg.register("airspeed_floor", 1)   # lo² − v²  [m²/s²]
    reg.register("airspeed_ceiling", 1)  # v² − hi²  [m²/s²]
    reg.register("beta_upper", 1)        # [rad]
    reg.register("beta_lower", 1)
    reg.register("alpha_upper", 1)
    reg.register("alpha_lower", 1)
    reg.register("altitude_floor", 1)    # z < 0 (NED)
    return reg


def goal_cost(
    goal: jax.Array,
    *,
    w_goal: float = 1.0,
    w_control: float = 0.01,
    w_rate: float = 0.0,
) -> tuple[Callable, Callable]:
    """Point-to-point losses in the style of the flagship controller
    (reference main/control/control.py:35-70): terminal goal distance +
    control effort."""
    goal = jnp.asarray(goal)

    def stage(x, u, k):
        return w_control * jnp.sum((u[:3] / 10.0) ** 2)

    def terminal(x):
        return w_goal * jnp.sum((x[:3] - goal) ** 2)

    return stage, terminal


def build_aircraft_ocp(
    params: AircraftParams,
    config: TrajectoryConfig,
    *,
    dt: float,
    stage_cost: Callable,
    terminal_cost: Callable,
    substeps: int = 1,
    quaternion: str = "integration",
    integration: str = "explicit",
    wind: Optional[jax.Array] = None,
    extra_ineq: Optional[Callable] = None,
    terminal_ineq: Optional[Callable] = None,
    terminal_eq: Optional[Callable] = None,
) -> OCPFunctions:
    """Assemble the glider OCP.

    `quaternion` follows the reference option axis (control/base.py:288-304):
      'integration'  renormalise inside the integrator (default, and the
                     TPU-native choice — exact on SO(3) via 'expmap')
      'expmap'       exponential-map update
      'constraint'   leave the norm to an equality constraint
      ''             nothing (drift allowed)
    """
    normalize = {
        "integration": "step",
        "expmap": "expmap",
        "constraint": "none",
        "baumgarte": "none",
        "": "none",
    }[quaternion]
    deriv = (lambda x, u: ac.state_derivative(params, x, u, wind)) if wind is not None else None
    step = integrators.make_step_fn(
        params, substeps=substeps, normalize=normalize, derivative_fn=deriv,
        integration=integration,
    )

    env_ineq = envelope_ineq(params, config.state, config.control,
                             **REFERENCE_ENVELOPE)

    def ineq(x, u, k):
        g = env_ineq(x, u, k)
        if extra_ineq is not None:
            g = jnp.concatenate([g, extra_ineq(x, u, k)])
        return g

    if quaternion == "constraint":
        def eq(x, u, k):
            return jnp.atleast_1d(jnp.sum(x[6:10] ** 2) - 1.0)
    elif quaternion == "baumgarte":
        # Baumgarte-stabilised norm constraint 2αφ̇ + β²φ = 0 with
        # φ = |q|² − 1, φ̇ = 2 qᵀq̇ (reference control/base.py:291-304,
        # α = β = 2)
        alpha_b, beta_b = 2.0, 2.0

        def eq(x, u, k):
            xdot = ac.state_derivative(params, x, u, wind)
            phi = jnp.sum(x[6:10] ** 2) - 1.0
            phi_dot = 2.0 * jnp.dot(x[6:10], xdot[6:10])
            return jnp.atleast_1d(2.0 * alpha_b * phi_dot + beta_b**2 * phi)
    else:
        def eq(x, u, k):
            return jnp.zeros((0,), dtype=x.dtype)

    kwargs = {}
    if terminal_ineq is not None:
        kwargs["terminal_ineq"] = terminal_ineq
    if terminal_eq is not None:
        kwargs["terminal_eq"] = terminal_eq

    return OCPFunctions(
        step=lambda x, u, k: step(x, u, dt),
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        ineq=ineq,
        eq=eq,
        **kwargs,
    )
