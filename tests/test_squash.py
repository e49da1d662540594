"""Unit tests for the tanh control-box reparameterization
(solvers/ocp.make_squash_maps / squash_controls) — the solver-facing
machinery the serving bench runs with (round-3 advisor: it altered the
jitted solve's step/cost/constraint functions untested).

Reference parity note: the reference hands its control box to IPOPT's
native bound handling (reference control/aircraft.py:29-41); the squash is
the iLQR-native equivalent — exact box feasibility by construction.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import SolverConfig
from aircraft_tpu.solvers import ilqr
from aircraft_tpu.solvers.ocp import (
    OCPFunctions,
    make_squash_maps,
    squash_controls,
)


class TestSquashMaps:
    LB = jnp.asarray([-5.0, -1.0, 0.0, 2.0])
    UB = jnp.asarray([5.0, 1.0, 10.0, 2.0])  # last channel degenerate

    def test_round_trip_interior(self):
        squash, unsquash = make_squash_maps(self.LB, self.UB)
        u = jnp.asarray([3.2, -0.7, 1.5, 2.0])
        np.testing.assert_allclose(
            np.asarray(squash(unsquash(u))), np.asarray(u), atol=1e-5)

    def test_bounds_clipped_warm_start_stays_finite(self):
        squash, unsquash = make_squash_maps(self.LB, self.UB)
        # warm starts AT (and beyond) the bounds: unsquash clips to the
        # margin so atanh stays finite, squash maps back inside the box
        for u in ([-5.0, 1.0, 10.0, 2.0], [-6.0, 2.0, 11.0, 3.0]):
            w = unsquash(jnp.asarray(u))
            assert np.isfinite(np.asarray(w)).all(), u
            back = np.asarray(squash(w))
            assert (back >= np.asarray(self.LB) - 1e-6).all()
            assert (back <= np.asarray(self.UB) + 1e-6).all()

    def test_squash_range_is_the_box(self):
        squash, _ = make_squash_maps(self.LB, self.UB)
        w = jnp.asarray([-50.0, 50.0, 0.0, 123.0])
        u = np.asarray(squash(w))
        assert (u >= np.asarray(self.LB) - 1e-5).all()
        assert (u <= np.asarray(self.UB) + 1e-5).all()

    def test_degenerate_channel_pinned_midpoint_zero_grad(self):
        squash, unsquash = make_squash_maps(self.LB, self.UB)
        w = jnp.asarray([0.3, -0.2, 0.9, 7.0])
        assert float(squash(w)[3]) == 2.0  # pinned at lb == ub
        g = jax.jacfwd(squash)(w)
        assert float(g[3, 3]) == 0.0       # frozen channel: no gradient
        # unsquash of the pinned value maps to w = 0 (not ±inf)
        assert float(unsquash(jnp.asarray([0.0, 0.0, 5.0, 2.0]))[3]) == 0.0


def _double_integrator_box_ocp(lb, ub, squash):
    """Point-to-point double integrator with a tight accel box — tiny
    enough to solve both formulations to high accuracy."""
    dt = 0.1

    def step(x, u, k):
        return jnp.stack([x[0] + dt * x[1], x[1] + dt * u[0]])

    def stage(x, u, k):
        return 1e-3 * u[0] ** 2

    def terminal(x):
        return 10.0 * ((x[0] - 1.0) ** 2 + x[1] ** 2)

    ocp = OCPFunctions(step=step, stage_cost=stage, terminal_cost=terminal)
    if squash:
        ocp, _, _ = squash_controls(ocp, lb, ub)
        return ocp
    return ocp.replace(
        ineq=lambda x, u, k: jnp.stack([u[0] - ub[0], lb[0] - u[0]]))


class TestSquashedSolveParity:
    def test_ineq_row_count_drops_without_box(self):
        from aircraft_tpu.config import glider_config
        from aircraft_tpu.control.aircraft import envelope_ineq

        cfg = glider_config()
        from aircraft_tpu.dynamics.aircraft import AircraftParams

        params = AircraftParams.from_config(cfg.aircraft)
        x = jnp.asarray(cfg.waypoints.initial_state, jnp.float32)
        u = jnp.zeros(7)
        g_box = envelope_ineq(params, cfg.state, cfg.control)(x, u, 0)
        g_nobox = envelope_ineq(params, cfg.state, cfg.control,
                                include_control_box=False)(x, u, 0)
        assert g_box.shape[-1] - g_nobox.shape[-1] == 14  # 7 upper + 7 lower

    def test_registry_mirrors_box_flag(self):
        from aircraft_tpu.control.aircraft import envelope_registry

        full = envelope_registry()
        slim = envelope_registry(include_control_box=False)
        assert full.total - slim.total == 14
        assert slim.describe(0) == "airspeed_floor"

    def test_window_solve_parity_squashed_vs_al_box(self):
        lb, ub = jnp.asarray([-1.0]), jnp.asarray([1.0])
        cfg = SolverConfig(max_al_iters=6, max_inner_iters=25,
                           hessian="gauss_newton")
        x0 = jnp.zeros(2)
        N = 30

        ocp_al = _double_integrator_box_ocp(lb, ub, squash=False)
        sol_al = ilqr.solve(ocp_al, x0, jnp.zeros((N, 1)), cfg)

        ocp_sq = _double_integrator_box_ocp(lb, ub, squash=True)
        sol_sq = ilqr.solve(ocp_sq, x0, jnp.zeros((N, 1)), cfg)
        u_sq = np.asarray(ocp_sq.control_squash(sol_sq.us))

        # squashed controls are box-feasible EXACTLY (the formulation's
        # point); the AL box is feasible only to its priced tolerance
        assert (np.abs(u_sq) <= 1.0 + 1e-6).all()
        # both reach the goal with comparable cost (same stationary point
        # up to the AL's box tolerance)
        assert abs(float(sol_sq.xs[-1, 0]) - 1.0) < 0.05
        assert abs(float(sol_al.xs[-1, 0]) - 1.0) < 0.05
        assert float(sol_sq.cost) < 1.25 * float(sol_al.cost) + 1e-3

    def test_squash_maps_attached_to_bundle(self):
        ocp_sq = _double_integrator_box_ocp(
            jnp.asarray([-1.0]), jnp.asarray([1.0]), squash=True)
        assert ocp_sq.control_squash is not None
        assert ocp_sq.control_unsquash is not None
        u = jnp.asarray([0.5])
        np.testing.assert_allclose(
            np.asarray(ocp_sq.control_squash(ocp_sq.control_unsquash(u))),
            np.asarray(u), atol=1e-5)
