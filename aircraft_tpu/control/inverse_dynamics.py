"""Inverse-dynamics OCP: forces/moments as decision variables.

Re-designs the reference `Reverse` controller (reference
control/inverse_dynamics.py:46-138): the integrator consumes *decision
variable* body-frame forces/moments while equality constraints tie them to
the aero model — decoupling the stiff aerodynamics from the integration
(the reference monkey-patches `_forces_ned`/`_moments_frd` through a
context manager; here the split is just a different OCP assembly).

Mapping onto the AL-iLQR structure:
    control  v = [u(7), F_frd(3), M_frd(3)]      (13 inputs)
    dynamics x⁺ = rigid_body(x, F_v, M_v)        (no aero inside the rollout)
    eq       F_v − F_aero(x, u) = 0,  M_v − M_aero(x, u) = 0
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from aircraft_tpu.config import SolverConfig, TrajectoryConfig
from aircraft_tpu.control.aircraft import REFERENCE_ENVELOPE, envelope_ineq
from aircraft_tpu.dynamics import aircraft as ac
from aircraft_tpu.dynamics import base
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.solvers import ilqr, integrators
from aircraft_tpu.solvers.ocp import OCPFunctions

FORCE = slice(7, 10)
MOMENT = slice(10, 13)


def build_inverse_dynamics_ocp(
    params: AircraftParams,
    config: TrajectoryConfig,
    *,
    dt: float,
    stage_cost: Callable,
    terminal_cost: Callable,
    substeps: int = 1,
    force_scale: float = 100.0,
    moment_scale: float = 10.0,
) -> OCPFunctions:
    """`stage_cost(x, u7, k)` / `terminal_cost(x)` operate on the plain
    aircraft state/control; force/moment matching is added internally."""

    def rigid_step_derivative(x, v):
        f = v[..., FORCE] * force_scale
        m = v[..., MOMENT] * moment_scale
        inertia = base.inertia_about_com(params.static_inertia, params.mass, params.com)
        return base.rigid_body_derivative(x, f, m, params.mass, inertia, params.gravity)

    def step(x, v, k):
        return integrators.step(
            params, x, v, dt,
            substeps=substeps, normalize="step",
            derivative_fn=rigid_step_derivative,
        )

    env = envelope_ineq(params, config.state, config.control,
                        **REFERENCE_ENVELOPE)

    def eq(x, v, k):
        u = v[..., :7]
        f_model = ac.forces_frd(params, x, u)
        m_model = ac.moments_frd(params, x, u)
        return jnp.concatenate(
            [
                (v[..., FORCE] * force_scale - f_model) / force_scale,
                (v[..., MOMENT] * moment_scale - m_model) / moment_scale,
            ],
            axis=-1,
        )

    def ineq(x, v, k):
        return env(x, v[..., :7], k)

    return OCPFunctions(
        step=step,
        stage_cost=lambda x, v, k: stage_cost(x, v[..., :7], k),
        terminal_cost=terminal_cost,
        ineq=ineq,
        eq=eq,
    )


def solve_inverse_dynamics(
    params: AircraftParams,
    config: TrajectoryConfig,
    goal: jax.Array,
    *,
    num_nodes: int = 50,
    dt: float = 0.05,
    substeps: int = 5,
    solver_config: Optional[SolverConfig] = None,
) -> ilqr.ILQRSolution:
    """Point-to-point solve in the inverse-dynamics formulation."""
    goal = jnp.asarray(goal)

    def stage_cost(x, u, k):
        return 1e-3 * jnp.sum(u[:3] ** 2)

    def terminal_cost(x):
        return 1e-2 * jnp.sum((x[:3] - goal) ** 2)

    ocp = build_inverse_dynamics_ocp(
        params, config, dt=dt, substeps=substeps,
        stage_cost=stage_cost, terminal_cost=terminal_cost,
    )
    x0 = jnp.asarray(config.waypoints.initial_state, dtype=jnp.float32)

    # seed force/moment channels with the model values along a trim-ish path
    v0 = jnp.zeros((num_nodes, 13), dtype=jnp.float32)
    f0 = ac.forces_frd(params, x0, jnp.zeros(7))
    m0 = ac.moments_frd(params, x0, jnp.zeros(7))
    v0 = v0.at[:, FORCE].set(f0 / 100.0).at[:, MOMENT].set(m0 / 10.0)

    cfg = solver_config or SolverConfig(max_al_iters=6, max_inner_iters=20)
    return ilqr.solve(ocp, x0, v0, cfg)
