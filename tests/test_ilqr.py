"""Solver tests on analytic problems (SURVEY §4 test pyramid item 3):
LQR with a known Riccati solution, then constrained quadrotor point-to-point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aircraft_tpu.config import SolverConfig
from aircraft_tpu.dynamics.quadrotor import QuadrotorParams
from aircraft_tpu.dynamics import quadrotor
from aircraft_tpu.solvers import ilqr, integrators
from aircraft_tpu.solvers.ocp import OCPFunctions


class TestLQRParity:
    """On a linear-quadratic problem, AL-iLQR must reproduce the exact
    finite-horizon LQR solution from the discrete Riccati recursion."""

    def setup_method(self):
        # double integrator, 2 states, 1 control
        self.dt = 0.1
        self.A = np.array([[1.0, self.dt], [0.0, 1.0]], dtype=np.float32)
        self.B = np.array([[0.5 * self.dt**2], [self.dt]], dtype=np.float32)
        self.Q = np.diag([1.0, 0.1]).astype(np.float32)
        self.R = np.array([[0.01]], dtype=np.float32)
        self.Qf = np.diag([100.0, 10.0]).astype(np.float32)
        self.N = 40
        self.x0 = np.array([1.0, 0.0], dtype=np.float32)

        A, B = jnp.asarray(self.A), jnp.asarray(self.B)
        Q, R, Qf = jnp.asarray(self.Q), jnp.asarray(self.R), jnp.asarray(self.Qf)

        self.ocp = OCPFunctions(
            step=lambda x, u, k: A @ x + B @ u,
            stage_cost=lambda x, u, k: 0.5 * x @ Q @ x + 0.5 * u @ R @ u,
            terminal_cost=lambda x: 0.5 * x @ Qf @ x,
        )

    def riccati_reference(self):
        """Exact finite-horizon LQR by backward recursion (numpy, float64)."""
        A, B = self.A.astype(np.float64), self.B.astype(np.float64)
        Q, R = self.Q.astype(np.float64), self.R.astype(np.float64)
        P = self.Qf.astype(np.float64)
        Ks = []
        for _ in range(self.N):
            K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
            P = Q + A.T @ P @ A - A.T @ P @ B @ K
            Ks.append(K)
        Ks = Ks[::-1]
        xs = [self.x0.astype(np.float64)]
        us = []
        for k in range(self.N):
            u = -Ks[k] @ xs[-1]
            us.append(u)
            xs.append(A @ xs[-1] + B @ u)
        return np.stack(xs), np.stack(us)

    def test_matches_riccati(self):
        cfg = SolverConfig(max_al_iters=1, max_inner_iters=8)
        sol = ilqr.solve(
            self.ocp, jnp.asarray(self.x0), jnp.zeros((self.N, 1)), cfg
        )
        xs_ref, us_ref = self.riccati_reference()
        # float32 solve vs float64 reference: agreement to ~1e-3 absolute
        np.testing.assert_allclose(np.asarray(sol.us), us_ref, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sol.xs), xs_ref, atol=1e-3)
        assert bool(sol.converged)


def quad_ocp(target, N, dt, thrust_max=10.0):
    """Quadrotor point-to-point OCP — now the package module
    (aircraft_tpu/control/quadrotor.py, reference control/quadrotor.py:14-41)."""
    from aircraft_tpu.control.quadrotor import build_quadrotor_ocp

    return build_quadrotor_ocp(target, dt=dt, thrust_max=thrust_max)


class TestQuadrotor:
    def test_point_to_point(self):
        from aircraft_tpu.control.quadrotor import solve_quadrotor_control

        N, dt = 60, 0.05
        target = np.array([5.0, 3.0, -8.0], dtype=np.float32)
        sol = solve_quadrotor_control(
            target, num_nodes=N, dt=dt,
            solver_config=SolverConfig(max_al_iters=6, max_inner_iters=25),
        )
        final_pos = np.asarray(sol.xs[-1, :3])
        assert np.linalg.norm(final_pos - target) < 0.2, final_pos
        us = np.asarray(sol.us)
        assert us.min() > -1e-3 and us.max() < 10.0 + 1e-3
        assert float(sol.violation) < 1e-3

    def test_batched_targets(self):
        N, dt = 40, 0.05
        targets = np.array(
            [[3.0, 0.0, -5.0], [-2.0, 4.0, -6.0], [1.0, -1.0, -3.0], [0.0, 0.0, -8.0]],
            dtype=np.float32,
        )
        sols = jax.vmap(_solve_quad_for_target, in_axes=(0, None, None))(
            jnp.asarray(targets), N, dt
        )
        final = np.asarray(sols.xs[:, -1, :3])
        err = np.linalg.norm(final - targets, axis=-1)
        assert np.all(err < 0.5), err


def quad_ocp_dynamic(N, dt, thrust_max=10.0):
    """Target-in-state variant — package module build_quadrotor_ocp_dynamic."""
    from aircraft_tpu.control.quadrotor import build_quadrotor_ocp_dynamic

    return build_quadrotor_ocp_dynamic(dt=dt, thrust_max=thrust_max)


_QUAD_DYNAMIC_CACHE = {}


def _solve_quad_for_target(target, N, dt):
    key = (N, dt)
    if key not in _QUAD_DYNAMIC_CACHE:
        _QUAD_DYNAMIC_CACHE[key] = quad_ocp_dynamic(N, dt)
    ocp = _QUAD_DYNAMIC_CACHE[key]
    x0 = jnp.zeros(13).at[6].set(1.0)  # inverted: body +z thrust opposes gravity
    z0 = jnp.concatenate([x0, target])
    return ilqr.solve(
        ocp, z0, jnp.full((N, 4), 9.81 / 4.0),
        SolverConfig(max_al_iters=4, max_inner_iters=20),
    )


class TestScanUnroll:
    """scan_unroll must not change solutions — only the loop structure."""

    def test_unroll_invariant(self):
        dt = 0.1
        A = jnp.asarray([[1.0, dt], [0.0, 1.0]], dtype=jnp.float32)
        B = jnp.asarray([[0.5 * dt**2], [dt]], dtype=jnp.float32)
        ocp = OCPFunctions(
            step=lambda x, u, k: A @ x + B @ u,
            stage_cost=lambda x, u, k: 0.5 * (x @ x) + 0.005 * (u @ u),
            terminal_cost=lambda x: 50.0 * (x @ x),
            ineq=lambda x, u, k: jnp.concatenate([u - 5.0, -5.0 - u]),
        )
        x0 = jnp.asarray([1.0, 0.0], dtype=jnp.float32)
        us0 = jnp.zeros((40, 1), dtype=jnp.float32)
        sols = {}
        for unroll in (1, 2, 5, 8):
            cfg = SolverConfig(max_al_iters=2, max_inner_iters=8,
                               scan_unroll=unroll)
            sols[unroll] = ilqr.solve_impl(ocp, x0, us0, cfg)
        base = np.asarray(sols[1].us)
        for unroll in (2, 5, 8):
            np.testing.assert_allclose(
                np.asarray(sols[unroll].us), base, atol=1e-5,
                err_msg=f"unroll={unroll}")
            np.testing.assert_allclose(
                float(sols[unroll].cost), float(sols[1].cost), rtol=1e-5)


class TestPerRowPenalty:
    """LANCELOT-style per-row penalty adaptation (SolverConfig.penalty_per_row
    / ocp.ALState.mu_row): rows that stay violated after a multiplier update
    get their OWN penalty escalated, without stiffening the rest of the
    problem.  Built for receding-horizon serving, where a uniformly carried
    large penalty collapses the chain (see ocp.py notes)."""

    def _ceiling_ocp(self):
        """Double integrator whose cost pulls the position to 2.0 against a
        hard ceiling x <= 1: the ceiling row is in direct conflict with the
        cost (stays violated under a weak penalty schedule), while a second
        never-active row must keep its factor at exactly 1."""
        import jax.numpy as jnp

        from aircraft_tpu.solvers.ocp import OCPFunctions

        dt = 0.1
        A = jnp.asarray([[1.0, dt], [0.0, 1.0]])
        B = jnp.asarray([[0.5 * dt**2], [dt]])
        return OCPFunctions(
            step=lambda x, u, k: A @ x + B @ u,
            stage_cost=lambda x, u, k: (
                100.0 * (x[0] - 2.0) ** 2 + 1e-3 * jnp.sum(u * u)),
            terminal_cost=lambda x: 100.0 * (x[0] - 2.0) ** 2,
            ineq=lambda x, u, k: jnp.stack([x[0] - 1.0, -x[0] - 50.0]),
        )

    def test_row_ratchet_prices_conflicted_row_selectively(self):
        import jax.numpy as jnp

        from aircraft_tpu.config import SolverConfig

        ocp = self._ceiling_ocp()
        x0 = jnp.zeros(2)
        us0 = jnp.zeros((20, 1))
        # deliberately weak uniform schedule: mu 1 -> 4 over 3 rounds
        base = dict(max_al_iters=4, max_inner_iters=12, penalty_init=1.0,
                    penalty_scale=2.0)
        sol_off = ilqr.solve(ocp, x0, us0, SolverConfig(**base))
        sol_on = ilqr.solve(
            ocp, x0, us0,
            SolverConfig(**base, penalty_per_row=True,
                         penalty_row_scale=10.0, penalty_row_max=1e3,
                         penalty_row_target=1e-3),
        )
        v_off = float(sol_off.violation)
        v_on = float(sol_on.violation)
        assert v_off > 1e-2  # the uniform schedule genuinely under-prices
        assert v_on < 0.2 * v_off, (v_on, v_off)
        mu_row = np.asarray(sol_on.al.mu_row)
        assert mu_row[0] > 1.0          # conflicted row escalated
        assert mu_row[1] == 1.0         # inactive row untouched

    def test_row_factors_off_by_default_and_bit_neutral_shape(self):
        import jax.numpy as jnp

        from aircraft_tpu.config import SolverConfig

        ocp = self._ceiling_ocp()
        sol = ilqr.solve(ocp, jnp.zeros(2), jnp.zeros((10, 1)),
                         SolverConfig(max_al_iters=2, max_inner_iters=5))
        np.testing.assert_array_equal(np.asarray(sol.al.mu_row), 1.0)


class TestDualCarryGate:
    """The violation-gated dual carry (ocp.shift_al_state ``decay``) — CPU
    regression of the frozen-course failure mode (round-3 verdict #6).

    Scenario: a receding-horizon chain whose plant starts DEEP in violation
    of a floor constraint it can only climb out of slowly (rate-limited, ~5
    windows of genuine transient infeasibility — the course's energy-bleed
    entry in miniature).  Carrying duals VERBATIM through the transient
    integrates λ ≈ Σ μ·g toward the cap; once feasibility returns, the
    accumulated dual demands a floor margin of λ/μ and the chain settles far
    above the true optimum (the course dived for speed until frozen).  The
    gate hands cold duals forward from infeasible windows; at steady state
    (feasible, floor ACTIVE) the carry stays on and keeps its win.
    """

    N, COMMIT, DT = 20, 10, 0.1

    def _ocp(self):
        dt = self.DT

        def step(x, u, k):
            p, v = x[0], x[1]
            return jnp.stack([p + dt * v, v + dt * u[0]])

        return OCPFunctions(
            step=step,
            # target BELOW the floor: the floor is active at the optimum
            # (v* = 5), so the steady-state dual is nonzero and the carry
            # has something real to win
            stage_cost=lambda x, u, k: (x[1] - 4.8) ** 2 + 0.01 * u[0] ** 2,
            terminal_cost=lambda x: (x[1] - 4.8) ** 2,
            # floor v >= 5; acceleration box |a| <= 1 (the rate limit that
            # makes the transient LONG)
            ineq=lambda x, u, k: jnp.stack(
                [5.0 - x[1], u[0] - 1.0, -1.0 - u[0]]),
        )

    def _run_chain(self, mode, n_windows=14):
        from aircraft_tpu.solvers import ocp as ocp_mod

        ocp = self._ocp()
        # ONE AL round per window — the serving budget that makes the carry
        # matter: with >=2 rounds the window itself can unwind a poisoned
        # multiplier before committing (the course's 13-dim unstable plant
        # could not, its line search cannot retreat from a committed dive)
        cfg = SolverConfig(max_al_iters=1, max_inner_iters=8,
                           hessian="gauss_newton")
        solve = jax.jit(lambda x0, us, al: ilqr.solve_impl(
            ocp, x0, us, cfg, al_init=al))
        x = jnp.asarray([0.0, 0.0])
        us = jnp.zeros((self.N, 1))
        al = None
        v_hist, lam_hist = [], []
        for _ in range(n_windows):
            sol = solve(x, us, al) if al is not None else jax.jit(
                lambda x0, uss: ilqr.solve_impl(ocp, x0, uss, cfg))(x, us)
            x = sol.xs[self.COMMIT]
            us = jnp.concatenate(
                [sol.us[self.COMMIT:],
                 jnp.tile(sol.us[-1:], (self.COMMIT, 1))], axis=0)
            if mode == "none":
                al = None
            else:
                decay = 1.0
                if mode == "gated" and float(sol.violation) > 0.5:
                    decay = 0.0
                al = ocp_mod.shift_al_state(sol.al, self.COMMIT,
                                            mu0=cfg.penalty_init,
                                            decay=decay)
            v_hist.append(float(x[1]))
            lam_hist.append(float(jnp.max(jnp.abs(sol.al.lam_ineq))))
        return np.asarray(v_hist), np.asarray(lam_hist)

    def test_ungated_carry_overshoots_after_transient(self):
        v_none, _ = self._run_chain("none")
        v_raw, _ = self._run_chain("ungated")
        v_gated, _ = self._run_chain("gated")
        # all chains climb out of the infeasible start
        assert v_none[-1] > 4.5 and v_gated[-1] > 4.5
        # REGRESSION (the course's dive-for-speed): the verbatim carry's
        # transient-accumulated dual makes the first post-transient windows
        # COMMIT a large floor overshoot (measured here: v peaks ~5.8 for a
        # floor at 5) — on the real unstable plant that committed excursion
        # lost the track and froze the course at s=0.18.  The gate removes
        # the excursion entirely.
        overshoot_raw = float(v_raw.max() - 5.0)
        overshoot_gated = float(v_gated.max() - 5.0)
        assert overshoot_raw > 0.3, overshoot_raw
        assert overshoot_gated < 0.1, overshoot_gated
        # and the gate KEEPS the steady-state dual-carry win: the carried
        # active-floor multiplier holds the chain feasible where the cold
        # chain parks slightly below the floor every window
        assert v_gated[-1] >= 5.0 - 1e-3, v_gated[-1]
        assert v_none[-1] < 5.0 - 0.01, v_none[-1]

    def test_gate_keeps_duals_at_feasible_steady_state(self):
        # once feasible, the gate must NOT strip the carry: the active
        # floor's multiplier survives window-to-window
        from aircraft_tpu.solvers import ocp as ocp_mod

        v, _ = self._run_chain("gated")
        ocp = self._ocp()
        cfg = SolverConfig(max_al_iters=2, max_inner_iters=8,
                           hessian="gauss_newton")
        # steady-state window: solve from the settled state with carry
        x = jnp.asarray([0.0, 5.0])
        sol = ilqr.solve(ocp, x, jnp.zeros((self.N, 1)), cfg)
        assert float(sol.violation) <= 0.5  # gate open
        al2 = ocp_mod.shift_al_state(sol.al, self.COMMIT,
                                     mu0=cfg.penalty_init, decay=1.0)
        assert float(jnp.max(np.abs(np.asarray(al2.lam_ineq)))) > 0.0


class TestTrajectoryWarmStart:
    """xs_init trajectory seeding (the reference's ca.Opti state guesses,
    reference control/base.py:339-385): re-solving AT a previous solution
    must keep it, and the returned iterate is always a true rollout."""

    def _ocp(self):
        dt = 0.1

        def step(x, u, k):
            return jnp.stack([x[0] + dt * x[1], x[1] + dt * u[0]])

        return OCPFunctions(
            step=step,
            stage_cost=lambda x, u, k: 1e-2 * u[0] ** 2,
            terminal_cost=lambda x: 10.0 * ((x[0] - 1.0) ** 2 + x[1] ** 2),
            ineq=lambda x, u, k: jnp.stack([u[0] - 1.0, -1.0 - u[0]]),
        )

    def test_resolve_at_solution_is_stable(self):
        ocp = self._ocp()
        cfg = SolverConfig(max_al_iters=3, max_inner_iters=15,
                           hessian="gauss_newton")
        x0 = jnp.zeros(2)
        sol = ilqr.solve(ocp, x0, jnp.zeros((25, 1)), cfg)
        re = ilqr.solve(ocp, x0, sol.us, cfg, None, sol.xs)
        assert float(re.cost) <= float(sol.cost) * (1 + 1e-5) + 1e-8
        np.testing.assert_allclose(np.asarray(re.us), np.asarray(sol.us),
                                   atol=1e-4)
        # returned trajectory is a true rollout (defects ~ 0)
        ks = jnp.arange(25)
        nxt = jax.vmap(lambda x, u, k: ocp.step(x, u, k))(re.xs[:-1], re.us, ks)
        assert float(jnp.max(jnp.abs(nxt - re.xs[1:]))) < 1e-5

    def test_inconsistent_seed_never_returned(self):
        # a garbage xs reference with good controls: the solver must return
        # a genuine rollout, not echo the seed back
        ocp = self._ocp()
        cfg = SolverConfig(max_al_iters=2, max_inner_iters=10,
                           hessian="gauss_newton")
        x0 = jnp.zeros(2)
        xs_fake = jnp.ones((26, 2)) * 37.0
        sol = ilqr.solve(ocp, x0, jnp.zeros((25, 1)), cfg, None, xs_fake)
        ks = jnp.arange(25)
        nxt = jax.vmap(lambda x, u, k: ocp.step(x, u, k))(
            sol.xs[:-1], sol.us, ks)
        assert float(jnp.max(jnp.abs(nxt - sol.xs[1:]))) < 1e-5
        assert float(jnp.max(jnp.abs(sol.xs[0] - x0))) == 0.0


class TestQuadrotorTimeOptimal:
    """Free time must actually buy time (round-3 verdict #4): on a goal
    reachable well inside the nominal schedule, the free-time machinery
    (static-dt ladder + per-knot 'variable' refinement,
    control/quadrotor.solve_quadrotor_time_optimal) returns a schedule
    STRICTLY faster than nominal, with every accepted candidate defect-
    gated as a true rollout.  Non-vacuous by construction — the nominal is
    sized 2x slack."""

    def test_time_strictly_bought(self):
        from aircraft_tpu.control.quadrotor import (
            solve_quadrotor_time_optimal,
        )

        out = solve_quadrotor_time_optimal(
            [15.0, 10.0, -8.0], num_nodes=40, dt_nominal=0.1,
            scales=(0.6, 0.8, 1.0), goal_tol=1.0,
        )
        # the nominal itself must be feasible (well-posed instance)...
        assert out["candidates"][-1]["feasible"], out["candidates"]
        # ...and a sub-nominal schedule strictly wins
        assert out["T_final"] < 0.85 * out["T_nominal"], out
        assert out["miss_uniform"] < 1.0
        # every feasible candidate is a certified rollout
        for r in out["candidates"]:
            if r["feasible"]:
                assert r["defect"] < 1e-3
        # the per-knot 'variable' formulation buys time from the slack
        # nominal ON ITS OWN (the ablation row non-degeneracy condition)
        if out.get("T_variable_from_nominal") is not None:
            assert out["T_variable_from_nominal"] < 0.95 * out["T_nominal"]
