"""Quadrotor point-to-point optimal control.

The package-level home of the quadrotor OCP (the reference's
`QuadrotorControl`, reference control/quadrotor.py:8-41 and its driver
main/control/quad_control.py:152-176): goal-distance loss, bounded
thrusts [0, thrust_max], terminal pull onto the target.  Two builders:

  * `build_quadrotor_ocp(target, …)`   — target baked into the closure
    (one compiled program per target),
  * `build_quadrotor_ocp_dynamic(…)`   — target rides the augmented-state
    tail (constant under the dynamics), so ONE compiled solve serves any
    target — the TPU-native shape for batched goal sweeps
    (`vmap` over z0, no retrace per goal).

The quadrotor is the framework's cheap smoke-test plant (SURVEY §4:
"fake plants for exercising the OCP stack without data artifacts").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from aircraft_tpu.config import SolverConfig
from aircraft_tpu.dynamics import quadrotor as quad_mod
from aircraft_tpu.dynamics.quadrotor import QuadrotorParams
from aircraft_tpu.solvers import ilqr, integrators
from aircraft_tpu.solvers.ocp import OCPFunctions

# reference loss weights (reference control/quadrotor.py:14-21: 1000·goal
# distance + 0.1·effort; the terminal split below reproduces the same
# stationary point with a per-stage goal pull that conditions the solve)
W_EFFORT = 0.1
W_STAGE_GOAL = 1e-4
W_TERMINAL_GOAL = 100.0
W_TERMINAL_VEL = 10.0


def _losses(dt: float):
    def stage_cost(x, tgt, u):
        return W_EFFORT * dt * jnp.sum(u * u) + W_STAGE_GOAL * jnp.sum(
            (x[:3] - tgt) ** 2
        )

    def terminal_cost(x, tgt):
        return W_TERMINAL_GOAL * jnp.sum((x[:3] - tgt) ** 2) + W_TERMINAL_VEL * jnp.sum(
            x[3:6] ** 2
        )

    return stage_cost, terminal_cost


def build_quadrotor_ocp(
    target,
    *,
    dt: float,
    thrust_max: float = 10.0,
    params: Optional[QuadrotorParams] = None,
    substeps: int = 1,
) -> OCPFunctions:
    """Point-to-point quadrotor OCP with the target closed over
    (reference control/quadrotor.py:14-41; thrust bounds [0, 10] per
    :23-28).  State is the plain 13-vector."""
    params = params or QuadrotorParams.default()
    step = integrators.make_step_fn(
        params, substeps=substeps, normalize="step",
        derivative_fn=lambda x, u: quad_mod.state_derivative(params, x, u),
    )
    target = jnp.asarray(target)
    stage_l, term_l = _losses(dt)

    return OCPFunctions(
        step=lambda x, u, k: step(x, u, dt),
        stage_cost=lambda x, u, k: stage_l(x, target, u),
        terminal_cost=lambda x: term_l(x, target),
        ineq=lambda x, u, k: jnp.concatenate([u - thrust_max, -u]),
    )


def build_quadrotor_ocp_dynamic(
    *,
    dt: float,
    thrust_max: float = 10.0,
    params: Optional[QuadrotorParams] = None,
    substeps: int = 1,
) -> OCPFunctions:
    """Quadrotor OCP over the augmented state z = [x(13), target(3)]; the
    target channels are constant under the dynamics, so one compiled solve
    handles any goal (batch goals by batching z0)."""
    params = params or QuadrotorParams.default()
    step13 = integrators.make_step_fn(
        params, substeps=substeps, normalize="step",
        derivative_fn=lambda x, u: quad_mod.state_derivative(params, x, u),
    )
    stage_l, term_l = _losses(dt)

    def step(z, u, k):
        x, tgt = z[:13], z[13:]
        return jnp.concatenate([step13(x, u, dt), tgt])

    return OCPFunctions(
        step=step,
        stage_cost=lambda z, u, k: stage_l(z[:13], z[13:], u),
        terminal_cost=lambda z: term_l(z[:13], z[13:]),
        ineq=lambda z, u, k: jnp.concatenate([u - thrust_max, -u]),
    )


def initial_state_inverted() -> jax.Array:
    """Hover-capable initial attitude: the reference plant's thrust acts
    along +z BODY (reference dynamics/quadrotor.py:42-44), so the vehicle
    starts rolled 180° (q = [1,0,0,0] xyzw) for body +z to oppose NED
    gravity — the same convention as the reference driver."""
    return jnp.zeros(13).at[6].set(1.0)


def solve_quadrotor_control(
    target,
    *,
    num_nodes: int = 60,
    dt: float = 0.05,
    thrust_max: float = 10.0,
    x0: Optional[jax.Array] = None,
    solver_config: Optional[SolverConfig] = None,
) -> ilqr.ILQRSolution:
    """End-to-end quadrotor point-to-point solve (the reference's
    main/control/quad_control.py:152-176 flow: N=200, dt=0.05, target
    [100,100,-200] — any N/target works; hover warm start)."""
    ocp = build_quadrotor_ocp(target, dt=dt, thrust_max=thrust_max)
    if x0 is None:
        x0 = initial_state_inverted()
    us0 = jnp.full((num_nodes, 4), 9.81 / 4.0)
    cfg = solver_config or SolverConfig(max_al_iters=6, max_inner_iters=25)
    return ilqr.solve(ocp, x0, us0, cfg)
