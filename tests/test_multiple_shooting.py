"""Multiple-shooting transform: defects close under AL and a STATE guess
rescues a solve that single shooting cannot crack from zero controls."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aircraft_tpu.config import SolverConfig
from aircraft_tpu.control.multiple_shooting import (
    controls_with_state_guess,
    multiple_shooting_ocp,
)
from aircraft_tpu.solvers import ilqr
from aircraft_tpu.solvers.ocp import OCPFunctions


def double_integrator_ocp(target, N, dt):
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[0.5 * dt**2], [dt]])

    return OCPFunctions(
        step=lambda x, u, k: A @ x + B @ u,
        stage_cost=lambda x, u, k: 0.01 * jnp.sum(u * u),
        terminal_cost=lambda x: 100.0 * jnp.sum((x - target) ** 2),
    )


class TestMultipleShooting:
    def test_defects_close_and_solution_matches_single_shooting(self):
        N, dt = 40, 0.1
        target = jnp.array([2.0, 0.0])
        base = double_integrator_ocp(target, N, dt)
        ms = multiple_shooting_ocp(base, state_dim=2, control_dim=1, segment_len=10)

        x0 = jnp.zeros(2)
        cfg = SolverConfig(max_al_iters=8, max_inner_iters=15)

        sol_ss = ilqr.solve(base, x0, jnp.zeros((N, 1)), cfg)

        # state guess: straight line to the target in the s-channels
        guess = jnp.linspace(0.0, 1.0, N + 1)[:, None] * target[None, :]
        vs = controls_with_state_guess(jnp.zeros((N, 1)), guess, 10)
        sol_ms = ilqr.solve(ms, x0, vs, cfg)

        xs = np.asarray(sol_ms.xs)
        # defects closed: trajectory continuous at segment boundaries
        assert float(sol_ms.violation) < 1e-2, float(sol_ms.violation)
        # same terminal behaviour as single shooting
        np.testing.assert_allclose(
            xs[-1], np.asarray(sol_ss.xs[-1]), atol=5e-2
        )

    def test_segment_teleport_then_converges(self):
        """With a huge-penalty-free first AL iteration the solver may use the
        segment jumps; after the schedule the defects must be ~0."""
        N, dt = 30, 0.1
        target = jnp.array([1.0, 0.0])
        base = double_integrator_ocp(target, N, dt)
        ms = multiple_shooting_ocp(base, state_dim=2, control_dim=1, segment_len=6)
        x0 = jnp.zeros(2)
        vs = controls_with_state_guess(
            jnp.zeros((N, 1)),
            jnp.linspace(0.0, 1.0, N + 1)[:, None] * target[None, :],
            6,
        )
        sol = ilqr.solve(ms, x0, vs, SolverConfig(max_al_iters=10, max_inner_iters=12))
        assert float(sol.violation) < 1e-2
        assert abs(float(sol.xs[-1, 0]) - 1.0) < 0.05
