"""Moving-horizon trajectory tracking (MHTT) — receding-horizon MPC.

Re-designs the reference `MHTT` controller (reference
control/moving_horizon.py) for the AL-iLQR solver:

  * Track progress s ∈ [0, 1] becomes an **augmented state** with defined
    dynamics ṡ = v·t̂(s)/L (+ position-error correction, reference
    moving_horizon.py:144-183) instead of a per-node decision variable with
    a monotonicity constraint — no extra constraints, no complementarity,
    and the whole window is one smooth iLQR problem.
  * The receding-horizon loop (reference main/mhe/mhtt.py:79-124) is a thin
    host loop around ONE compiled window solve: solve → commit the
    non-overlap prefix through the plant → shift the warm start → resolve.
    Solver object reuse across MPC iterations comes free from jit caching
    (the reference needed explicit Opti parameter re-binding).

The same window solve vmaps over scenario batches — thousands of
simultaneous receding-horizon controllers per chip.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import SolverConfig, TrajectoryConfig
from aircraft_tpu.control.aircraft import envelope_ineq
from aircraft_tpu.control.initialisation import (
    DubinsInitialiser,
    catmull_rom_eval,
    catmull_rom_tangent,
)
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.solvers import ilqr, integrators
from aircraft_tpu.solvers.ocp import OCPFunctions

# loss weights (reference moving_horizon.py:47-56)
W_TRACKING = 10.0
W_PROGRESS = 5.0
W_PROGRESS_RATE = 2.0
W_BACKWARD = 50.0
W_TERMINAL_ALIGN = 20.0
W_LOW_VELOCITY = 10.0
W_CONTROL = 100.0 / 100.0  # effort weight per squared unit (controls ~O(1))


class MHTTWindow(NamedTuple):
    xs: jax.Array        # (N+1, 14) augmented states [x(13), s]
    us: jax.Array        # (N, 7)
    cost: jax.Array
    violation: jax.Array
    converged: jax.Array


def build_mhtt_ocp(
    params: AircraftParams,
    config: TrajectoryConfig,
    track_points: jax.Array,
    track_length: float,
    *,
    dt: float,
    substeps: int = 1,
    progress_correction: float = 0.05,
    wind_channels: bool = False,
) -> OCPFunctions:
    """OCP over the augmented state z = [x(13), s] (+ wind(3) when
    `wind_channels` — the MHE estimate rides constant state channels, so
    the controller adapts to re-estimated wind without any retrace)."""
    from aircraft_tpu.dynamics import aircraft as _ac

    if wind_channels:
        def _deriv(x, u, w):
            return _ac.state_derivative(params, x, u, wind=w)
    step13 = integrators.make_step_fn(params, substeps=substeps, normalize="step")
    L = float(track_length)
    env = envelope_ineq(params, config.state, config.control)

    def progress_rate(z):
        x, s = z[..., :13], z[..., 13]
        tangent = catmull_rom_tangent(track_points, s) / L  # unit-ish direction
        tnorm = jnp.linalg.norm(tangent, axis=-1)
        tdir = tangent / jnp.where(tnorm > 1e-3, tnorm, 1.0)[..., None]
        s_dot = jnp.einsum("...i,...i->...", x[..., 3:6], tdir) / L
        pos_err = x[..., 0:3] - catmull_rom_eval(track_points, s)
        corr = jnp.einsum("...i,...i->...", pos_err, tdir) / L
        return s_dot, corr, pos_err

    def step(z, u, k):
        x, s = z[..., :13], z[..., 13]
        s_dot, corr, _ = progress_rate(z)
        s_next = jnp.clip(s + s_dot * dt + progress_correction * corr, 0.0, 1.0)
        if wind_channels:
            w = z[..., 14:17]
            x_next = integrators.step(
                params, x, u, dt, substeps=substeps, normalize="step",
                derivative_fn=lambda xx, uu: _deriv(xx, uu, w),
            )
            return jnp.concatenate([x_next, s_next[..., None], w], axis=-1)
        return jnp.concatenate([step13(x, u, dt), s_next[..., None]], axis=-1)

    def stage_cost(z, u, k):
        x, s = z[:13], z[13]
        s_dot, _, pos_err = progress_rate(z)
        tracking = jnp.sum(pos_err * pos_err)
        backward = jnp.maximum(0.0, -s_dot) ** 2
        speed = jnp.linalg.norm(x[3:6])
        low_vel = jnp.maximum(0.1 - speed, 0.0) ** 2
        effort = jnp.sum(u * u)
        # saturate the progress-rate reward — an unbounded −s_dot term lets
        # early (weak-penalty) AL iterations exploit physically absurd
        # speeds before the envelope constraints bite
        rate_reward = 0.5 * jnp.tanh(s_dot / 0.5)
        # soft overspeed barrier backing up the hard AL envelope constraint
        overspeed = jnp.maximum(speed - 110.0, 0.0) ** 2
        return (
            W_TRACKING * tracking
            - W_PROGRESS * s
            - W_PROGRESS_RATE * rate_reward
            + W_BACKWARD * backward
            + W_LOW_VELOCITY * low_vel
            + W_CONTROL * effort
            + 1.0 * overspeed
        )

    def terminal_cost(z):
        x, s = z[:13], z[13]
        goal = catmull_rom_eval(track_points, jnp.asarray(1.0))
        align = jnp.linalg.norm(x[:3] - goal + 1e-9)
        return W_TERMINAL_ALIGN * align - W_PROGRESS * 10.0 * s

    def ineq(z, u, k):
        return env(z[:13], u, k)

    return OCPFunctions(
        step=step, stage_cost=stage_cost, terminal_cost=terminal_cost, ineq=ineq
    )


class MHTT:
    """Receding-horizon driver around one compiled window solve."""

    def __init__(
        self,
        params: AircraftParams,
        config: TrajectoryConfig,
        track: DubinsInitialiser,
        *,
        num_nodes: int = 50,
        dt: float = 0.01,
        overlap: int = 30,
        substeps: int = 1,
        solver_config: Optional[SolverConfig] = None,
    ):
        self.params = params
        self.config = config
        self.track = track
        self.N = num_nodes
        self.dt = dt
        self.overlap = overlap
        self.commit = num_nodes - overlap
        # MPC windows favour the Gauss-Newton Hessian: PSD curvature and a
        # much smaller compiled program (no complementarity terms here)
        self.solver_config = solver_config or SolverConfig(
            max_al_iters=2, max_inner_iters=12, hessian="gauss_newton"
        )
        self.ocp = build_mhtt_ocp(
            params, config, track.track_points, track.length(), dt=dt,
            substeps=substeps,
        )
        self._solve = jax.jit(
            lambda z0, us: ilqr.solve(self.ocp, z0, us, self.solver_config)
        )
        self._solve_batch = jax.jit(
            lambda z0s, uss: ilqr.solve_batch(self.ocp, z0s, uss, self.solver_config)
        )

    def solve_window(self, x0: jax.Array, s0: float, us_init: jax.Array) -> MHTTWindow:
        z0 = jnp.concatenate([x0, jnp.asarray([s0], dtype=x0.dtype)])
        sol = self._solve(z0, us_init)
        return MHTTWindow(
            xs=sol.xs, us=sol.us, cost=sol.cost,
            violation=sol.violation, converged=sol.converged,
        )

    def run_batch(
        self,
        x0s: jax.Array,            # (B, 13)
        *,
        s0s=None,                  # (B,) initial progress
        max_windows: int = 50,
        progress_target: float = 0.99,
    ) -> dict:
        """Closed-loop receding-horizon MPC over a whole scenario batch: all
        scenarios replan in lockstep, each window one batched solve (the
        production serving shape — thousands of simultaneous controllers).
        Finished scenarios keep solving masked-in-place (their progress is
        pinned at the target), so the batch stays shape-uniform.
        """
        B = x0s.shape[0]
        us = jnp.zeros((B, self.N, 7), dtype=jnp.float32)
        x = jnp.asarray(x0s, dtype=jnp.float32)
        s = (jnp.zeros(B, dtype=jnp.float32) if s0s is None
             else jnp.asarray(s0s, dtype=jnp.float32))
        windows = 0
        progress_hist = [np.asarray(s)]

        while windows < max_windows and float(jnp.min(s)) < progress_target:
            z0s = jnp.concatenate([x, s[:, None]], axis=-1)
            sols = self._solve_batch(z0s, us)
            c = self.commit
            x = sols.xs[:, c, :13]
            s = jnp.maximum(s, sols.xs[:, c, 13])
            us = jnp.concatenate(
                [sols.us[:, c:], jnp.tile(sols.us[:, -1:], (1, c, 1))], axis=1
            )
            windows += 1
            progress_hist.append(np.asarray(s))

        return {
            "progress": np.asarray(s),
            "windows": windows,
            "success_rate": float(np.mean(np.asarray(s) >= progress_target)),
            "progress_history": np.stack(progress_hist),
        }

    def run(
        self,
        x0: jax.Array,
        *,
        s0: float = 0.0,
        max_windows: int = 200,
        progress_target: float = 0.99,
    ) -> dict:
        """Closed-loop MPC until the track is consumed
        (reference main/mhe/mhtt.py:79-124)."""
        us = jnp.zeros((self.N, 7), dtype=jnp.float32)
        x = jnp.asarray(x0, dtype=jnp.float32)
        s = float(s0)

        committed_states = [np.asarray(x)]
        committed_controls = []
        windows = 0
        success = True

        while s < progress_target and windows < max_windows:
            sol = self.solve_window(x, s, us)
            # abort only on divergence or gross infeasibility (reference
            # breaks on IPOPT failure, main/mhe/mhtt.py:82-84); small
            # envelope residuals are expected mid-flight under warm AL
            if (not np.all(np.isfinite(np.asarray(sol.xs)))) or float(
                sol.violation
            ) > 50.0:
                success = False
                break
            # commit the non-overlap prefix
            c = self.commit
            committed_controls.append(np.asarray(sol.us[:c]))
            committed_states.append(np.asarray(sol.xs[1 : c + 1, :13]))
            x = sol.xs[c, :13]
            s = float(sol.xs[c, 13])
            # shift-and-hold warm start (reference warm-start carry)
            us = jnp.concatenate([sol.us[c:], jnp.tile(sol.us[-1:], (c, 1))], axis=0)
            windows += 1

        states = np.concatenate(
            [np.atleast_2d(committed_states[0])] + committed_states[1:], axis=0
        ) if committed_controls else np.atleast_2d(np.asarray(x0))
        return {
            "states": states,
            "controls": np.concatenate(committed_controls, axis=0)
            if committed_controls
            else np.zeros((0, 7)),
            "progress": s,
            "windows": windows,
            "success": success and s >= progress_target,
        }
