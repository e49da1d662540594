"""Solution parity against an independent NLP solver (SURVEY §7 hard
part 2: "matching IPOPT solutions to <1e-3 control deviation").

IPOPT/CasADi are not in this environment, so the stand-in oracle is
scipy's SLSQP on the reference's own direct multiple-shooting
transcription (`solvers/reference_nlp.py`) — a dense SQP, the same
algorithmic family as IPOPT, sharing nothing with the AL-iLQR but the
problem callables.  Measured at full size (N=30 quadrotor, see
docs/DESIGN.md): max |Δu| = 5.5e-4, relative cost diff 6e-7.  The suite
runs reduced horizons to keep the dense host solve fast.
"""

import numpy as np
import jax
import jax.numpy as jnp

from aircraft_tpu.config import SolverConfig
from aircraft_tpu.dynamics import quadrotor
from aircraft_tpu.dynamics.quadrotor import QuadrotorParams
from aircraft_tpu.solvers import ilqr, integrators
from aircraft_tpu.solvers.ocp import OCPFunctions
from aircraft_tpu.solvers.reference_nlp import solve_reference_nlp


def _lqr_ocp(dt=0.1):
    A = jnp.asarray([[1.0, dt], [0.0, 1.0]], dtype=jnp.float32)
    B = jnp.asarray([[0.5 * dt**2], [dt]], dtype=jnp.float32)
    Q = jnp.asarray(np.diag([1.0, 0.1]), dtype=jnp.float32)
    R = jnp.asarray([[0.01]], dtype=jnp.float32)
    Qf = jnp.asarray(np.diag([100.0, 10.0]), dtype=jnp.float32)
    return OCPFunctions(
        step=lambda x, u, k: A @ x + B @ u,
        stage_cost=lambda x, u, k: 0.5 * x @ Q @ x + 0.5 * u @ R @ u,
        terminal_cost=lambda x: 0.5 * x @ Qf @ x,
    )


class TestOracleValidation:
    """The NLP transcription itself is validated against the exact
    finite-horizon Riccati solution before being trusted as a parity
    oracle."""

    def test_lqr_matches_riccati(self):
        dt, N = 0.1, 20
        ocp = _lqr_ocp(dt)
        x0 = np.array([1.0, 0.0], dtype=np.float32)

        nlp = solve_reference_nlp(ocp, x0, np.zeros((N, 1), np.float32))
        assert nlp.success, nlp.message
        assert nlp.violation < 1e-10

        A = np.array([[1.0, dt], [0.0, 1.0]])
        B = np.array([[0.5 * dt**2], [dt]])
        Q, R = np.diag([1.0, 0.1]), np.array([[0.01]])
        P = np.diag([100.0, 10.0]).astype(np.float64)
        Ks = []
        for _ in range(N):
            K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
            P = Q + A.T @ P @ A - A.T @ P @ B @ K
            Ks.append(K)
        Ks = Ks[::-1]
        xs = [x0.astype(np.float64)]
        us_ref = []
        for k in range(N):
            u = -Ks[k] @ xs[-1]
            us_ref.append(u)
            xs.append(A @ xs[-1] + B @ u)
        np.testing.assert_allclose(nlp.us, np.stack(us_ref), atol=1e-5)


def _quad_ocp(target, dt, thrust_max=10.0):
    """The reference quadrotor OCP (reference control/quadrotor.py:14-41),
    from the package module."""
    from aircraft_tpu.control.quadrotor import build_quadrotor_ocp

    return build_quadrotor_ocp(target, dt=dt, thrust_max=thrust_max)


class TestSolverParity:
    """AL-iLQR and the independent SQP must agree on the constrained
    6-DoF quadrotor point-to-point problem — same stationary point from
    different algorithms."""

    def test_quadrotor_control_parity_f32(self):
        """Device-precision solve: cost parity to ~1e-7; control deviation
        sits at the float32 conditioning floor (~1e-3 in near-flat
        directions — measured 1.3e-3 here, 5.5e-4 at N=30)."""
        N, dt = 16, 0.08
        target = np.array([2.0, 1.0, -4.0], dtype=np.float32)
        ocp = _quad_ocp(target, dt)
        x0 = jnp.zeros(13).at[6].set(1.0)  # rolled 180°: body +z thrust up
        us0 = jnp.full((N, 4), 9.81 / 4.0)

        sol = ilqr.solve(
            ocp, x0, us0,
            SolverConfig(max_al_iters=14, max_inner_iters=60, tol=1e-8,
                         penalty_scale=20.0),
        )
        assert bool(sol.converged)

        nlp = solve_reference_nlp(ocp, x0, us0, maxiter=250)
        assert nlp.success, nlp.message
        assert nlp.violation < 1e-8

        max_du = np.abs(np.asarray(sol.us) - nlp.us).max()
        rel_cost = abs(float(sol.cost) - nlp.cost) / abs(nlp.cost)
        assert max_du < 2e-3, max_du
        assert rel_cost < 1e-6, rel_cost

    def test_quadrotor_control_parity_f64(self):
        """At matched (double) precision the two solvers agree to ~1e-5 in
        controls (measured 6.4e-6) — the BASELINE <1e-3 target with two
        orders of margin.  The iLQR is dtype-generic: the same jitted
        program solves in float64 under `jax.enable_x64`."""
        N, dt = 16, 0.08
        target = np.array([2.0, 1.0, -4.0], dtype=np.float32)
        ocp = _quad_ocp(target, dt)

        x0 = np.zeros(13, np.float32)
        x0[6] = 1.0
        us0 = np.full((N, 4), 9.81 / 4.0, np.float32)
        nlp = solve_reference_nlp(ocp, x0, us0, maxiter=250)
        assert nlp.success, nlp.message

        with jax.enable_x64():
            sol = ilqr.solve(
                ocp,
                jnp.asarray(x0, jnp.float64),
                jnp.asarray(us0, jnp.float64),
                SolverConfig(max_al_iters=14, max_inner_iters=60, tol=1e-10,
                             penalty_scale=20.0),
            )
            max_du = np.abs(np.asarray(sol.us) - nlp.us).max()
            rel_cost = abs(float(sol.cost) - nlp.cost) / abs(nlp.cost)
        assert max_du < 1e-4, max_du
        assert rel_cost < 1e-9, rel_cost
