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
from aircraft_tpu.solvers import ocp as ocp_mod
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
    track_dims: tuple[int, ...] = (0, 1, 2),
    v_ref: float = 0.0,
    w_speed: float = 0.0,
    w_rate: float = 0.0,
    alpha_guard_deg: float = 0.0,
    beta_guard_deg: float = 0.0,
    envelope_overrides: Optional[dict] = None,
    stall_guard: tuple[float, float] = (2.0, 10.0),
    squash_box: bool = False,
    tail_damp: Optional[tuple[int, float]] = None,
    spec_out: Optional[dict] = None,
) -> OCPFunctions:
    """OCP over the augmented state z = [x(13), s] (+ wind(3) when
    `wind_channels` — the MHE estimate rides constant state channels, so
    the controller adapts to re-estimated wind without any retrace).

    ``track_dims`` restricts the tracking error to the declared objective
    dimensions (the reference's ``waypoint_indices``, e.g. ``(0, 1)`` for
    the 2D-waypoint glider course, reference utils.py:247-275): with a 2D
    objective the altitude profile is left to the plant's natural glide
    instead of being forced onto the track's glide-ratio backfill — chasing
    an infeasibly steep z-profile overspeeds the plant and blows up its
    turn radius, losing the xy course.

    The progress tangent is projected onto the SAME dims: otherwise the
    backfilled track's down-slope lets the controller farm progress reward
    by diving (v·t̂ credit with zero xy tracking error near the start —
    observed: bunt-over, stall at 20 m/s, ground impact in 11 s).  With the
    vertical axis untracked, ``w_speed·(|v| − v_ref)²`` is the term that
    regulates it — a dive accelerates, a zoom-climb stalls, so a speed hold
    pins the flight-path angle near the natural glide slope."""
    from aircraft_tpu.dynamics import aircraft as _ac

    dim_mask = jnp.zeros(3, dtype=jnp.float32).at[jnp.asarray(track_dims)].set(1.0)

    if wind_channels:
        def _deriv(x, u, w):
            return _ac.state_derivative(params, x, u, wind=w)
    step13 = integrators.make_step_fn(params, substeps=substeps, normalize="step")
    L = float(track_length)
    env_overrides = dict(envelope_overrides or {})
    if squash_box:
        # box enforced exactly by the tanh reparameterization below —
        # keeping the 14 box rows under the AL is then dead weight
        env_overrides["include_control_box"] = False
    env = envelope_ineq(params, config.state, config.control,
                        **env_overrides)

    def progress_rate(z):
        x, s = z[..., :13], z[..., 13]
        tangent = catmull_rom_tangent(track_points, s) / L * dim_mask
        tnorm = jnp.linalg.norm(tangent, axis=-1)
        tdir = tangent / jnp.where(tnorm > 1e-3, tnorm, 1.0)[..., None]
        s_dot = jnp.einsum("...i,...i->...", x[..., 3:6], tdir) / L
        pos_err = (x[..., 0:3] - catmull_rom_eval(track_points, s)) * dim_mask
        corr = jnp.einsum("...i,...i->...", pos_err, tdir) / L
        return s_dot, corr, pos_err

    def step(z, u, k):
        x, s = z[..., :13], z[..., 13]
        s_dot, corr, _ = progress_rate(z)
        # upper clip sits ABOVE 1 so the terminal progress reward keeps a
        # live gradient through s = 1 (a hard clip at 1.0 zeroes ds/du for
        # every knot once the window tail reaches the track end — a
        # flat-gradient trap on short tracks); the track functions clamp
        # their own argument, so s slightly past 1 just holds the endpoint
        s_next = jnp.clip(s + s_dot * dt + progress_correction * corr,
                          0.0, 1.05)
        if wind_channels:
            w = z[..., 14:17]
            x_next = integrators.step(
                params, x, u, dt, substeps=substeps, normalize="step",
                derivative_fn=lambda xx, uu: _deriv(xx, uu, w),
            )
            return jnp.concatenate([x_next, s_next[..., None], w], axis=-1)
        return jnp.concatenate([step13(x, u, dt), s_next[..., None]], axis=-1)

    def stage_residuals(z, u, k):
        """Least-squares part of the stage cost, as a residual vector r with
        cost 0.5·‖r‖² (each weight w·t² maps to a component √(2w)·t).  The
        Gauss-Newton quadraticizer turns this into JᵀJ curvature — one
        short-vector jacfwd per knot instead of full scalar Hessians."""
        x = z[..., :13]
        _, _, pos_err = progress_rate(z)
        s_dot, _, _ = progress_rate(z)
        speed = jnp.linalg.norm(x[..., 3:6], axis=-1)
        parts = [
            jnp.sqrt(2.0 * W_TRACKING) * pos_err,
            jnp.sqrt(2.0 * W_BACKWARD) * jnp.maximum(0.0, -s_dot)[..., None],
            jnp.sqrt(2.0 * W_LOW_VELOCITY)
            * jnp.maximum(0.1 - speed, 0.0)[..., None],
            jnp.sqrt(2.0 * W_CONTROL) * u,
            # soft overspeed barrier backing up the hard AL envelope constraint
            jnp.sqrt(2.0) * jnp.maximum(speed - 110.0, 0.0)[..., None],
        ]
        if w_speed > 0.0:
            # two-part speed regulation (calibrated in closed loop on the
            # glide-limit course): a GENTLE symmetric hold that guides
            # off-speed starts toward v_ref without violent pitch
            # transients, plus a 10× stall guard below v_ref − 2 — the
            # symmetric term alone lets the energy-optimal-but-illegal
            # slower glide drift under the 30 m/s envelope floor faster
            # than the AL penalty can bite (observed: committed speed 20,
            # stall departure); a hard asymmetric term alone leaves a fast
            # start (50 m/s) undamped into the first turn
            parts.append(jnp.sqrt(2.0 * w_speed) * (speed - v_ref)[..., None])
            # stall_guard = (margin, factor): extra weight below
            # v_ref - margin
            parts.append(
                jnp.sqrt(2.0 * stall_guard[1] * w_speed)
                * jnp.maximum((v_ref - stall_guard[0]) - speed, 0.0)[..., None]
            )
        # stall-departure guards, active BEFORE the AL envelope multipliers
        # ramp up: body-rate damping keeps maneuvers in the attached-flow
        # regime, and a soft angle-of-attack margin pushes back inside the
        # (chaotic) post-stall boundary where line-search candidates freeze
        if w_rate > 0.0:
            parts.append(jnp.sqrt(2.0 * w_rate) * x[..., 10:13])
        if alpha_guard_deg > 0.0 or beta_guard_deg > 0.0:
            from aircraft_tpu.dynamics import aircraft as _ac2

            aero = _ac2.aero_state(params, x, u)
            if alpha_guard_deg > 0.0:
                a_lim = jnp.deg2rad(alpha_guard_deg)
                parts.append(
                    jnp.sqrt(20.0)
                    * jnp.maximum(jnp.abs(aero.alpha) - a_lim, 0.0)[..., None]
                )
            if beta_guard_deg > 0.0:
                # soft sideslip margin INSIDE the hard AL |β| row: fitted
                # surrogates can have asymmetric yaw aero that rides 6-9°
                # of β in coordinated-looking flight, and in turns the AL's
                # 10° row is then fought afresh every window (measured:
                # β rows are the steady-state violation floor of the
                # serving chain, ~0.005-0.01 rad at the 4x20 budget).  The
                # cost-level guard holds the margin; the AL certifies.
                b_lim = jnp.deg2rad(beta_guard_deg)
                parts.append(
                    jnp.sqrt(20.0)
                    * jnp.maximum(jnp.abs(aero.beta) - b_lim, 0.0)[..., None]
                )
        return jnp.concatenate(parts, axis=-1)

    def stage_rest(z, u, k):
        """Non-least-squares terms (progress rewards): exact gradient in the
        GN expansion, curvature dropped (near-linear; keeps stages PSD)."""
        s = z[..., 13]
        s_dot, _, _ = progress_rate(z)
        # saturate the progress-rate reward — an unbounded −s_dot term lets
        # early (weak-penalty) AL iterations exploit physically absurd
        # speeds before the envelope constraints bite
        rate_reward = 0.5 * jnp.tanh(s_dot / 0.5)
        rest = -W_PROGRESS * s - W_PROGRESS_RATE * rate_reward
        if tail_damp is not None:
            # damp the progress greed past the commit knot: the horizon
            # tail is weakly tracked (position error accumulates slowly),
            # so undamped progress reward farms s_dot there by skidding the
            # velocity vector toward the tangent — measured as the β/α-row
            # violation floor concentrated in knots ≥ commit while the
            # committed prefix solves clean
            rest = rest * jnp.where(k >= tail_damp[0], tail_damp[1], 1.0)
        return rest

    def stage_cost(z, u, k):
        r = stage_residuals(z, u, k)
        return 0.5 * jnp.sum(r * r, axis=-1) + stage_rest(z, u, k)

    def terminal_cost(z):
        x, s = z[:13], z[13]
        # align to the track point at the TERMINAL PROGRESS ACHIEVED, not to
        # the track end: on a long track the s=1 goal sits far behind the
        # window's reach, and minimising distance to it drags the window
        # tail backwards (observed: every window decelerating/zoom-climbing
        # into a stall near its horizon).  The reference's terminal term
        # likewise aligns to the local track target
        # (reference moving_horizon.py:96-106).
        goal = catmull_rom_eval(track_points, s)
        align = jnp.linalg.norm((x[:3] - goal) * dim_mask + 1e-9)
        return W_TERMINAL_ALIGN * align - W_PROGRESS * 10.0 * s

    def ineq(z, u, k):
        return env(z[:13], u, k)

    built = OCPFunctions(
        step=step, stage_cost=stage_cost, terminal_cost=terminal_cost, ineq=ineq,
        stage_residuals=stage_residuals, stage_rest=stage_rest,
    )
    if squash_box:
        from aircraft_tpu.solvers.ocp import squash_controls

        lb, ub = config.control.bounds(7)
        built, _, _ = squash_controls(built, lb, ub)
    if spec_out is not None:
        # everything the fused batch-lanes window kernel needs to mirror
        # this exact formulation (kernels/window_kernel.py) — filled from
        # the RESOLVED values, not the caller's arguments, so the kernel
        # and the jnp path can never silently diverge on defaults
        spec_out.update(
            params=params,
            track_points=track_points,
            track_length=L,
            dt=dt,
            substeps=substeps,
            progress_correction=progress_correction,
            track_dims=tuple(track_dims),
            v_ref=v_ref,
            w_speed=w_speed,
            w_rate=w_rate,
            alpha_guard_deg=alpha_guard_deg,
            beta_guard_deg=beta_guard_deg,
            stall_guard=tuple(stall_guard),
            tail_damp=tail_damp,
            wind_channels=wind_channels,
            envelope=env.resolved,
            squash_box=squash_box,
            squash_bounds=(config.control.bounds(7) if squash_box else None),
        )
    return built


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
        track_dims: Optional[tuple[int, ...]] = None,
        v_ref: Optional[float] = None,
        w_speed: Optional[float] = None,
        w_rate: float = 0.0,
        alpha_guard_deg: float = 0.0,
        beta_guard_deg: float = 0.0,
        envelope_overrides: Optional[dict] = None,
        progress_correction: float = 0.05,
        stall_guard: tuple[float, float] = (2.0, 10.0),
        dual_carry: bool = True,
        carry_gate: float = 10.0,
        fused: Optional[bool] = None,
    ):
        if v_ref is None:
            v_ref = float(config.waypoints.default_velocity)
        if track_dims is None:
            # full 3D tracking by default even for 2D objectives: the track
            # z-profile anchors the (unstable) longitudinal axis — pair a 2D
            # objective with z_mode='glide' track construction rather than
            # dropping z from the tracking cost (xy-only tracking leaves the
            # phugoid unregulated; observed stall/tumble in closed loop)
            track_dims = (0, 1, 2)
        if w_speed is None:
            # speed hold as a regulariser only when the vertical axis is
            # untracked (see build_mhtt_ocp docstring)
            w_speed = 0.5 if 2 not in track_dims else 0.0
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
            max_al_iters=2, max_inner_iters=12, hessian="gauss_newton",
            reg_escalate=100.0,
        )
        self._spec = {}
        self.ocp = build_mhtt_ocp(
            params, config, track.track_points, track.length(), dt=dt,
            substeps=substeps, track_dims=track_dims,
            v_ref=v_ref, w_speed=w_speed,
            w_rate=w_rate, alpha_guard_deg=alpha_guard_deg,
            beta_guard_deg=beta_guard_deg,
            envelope_overrides=envelope_overrides,
            progress_correction=progress_correction,
            stall_guard=stall_guard,
            spec_out=self._spec,
        )
        # fused batch-lanes window kernels (kernels/window_kernel.py) are
        # the TPU default since round 5 — measured 4.5-5.6x the jnp path
        # on the bench fleet at identical solution quality; batch-1 serving
        # and candidate windows pad to the 128-lane tile (the chip is
        # underutilised there regardless).  `fused=False` keeps the jnp
        # path; on CPU the jnp path stays the default (interpret-mode
        # kernels are test-only).
        if fused is None:
            from aircraft_tpu.kernels.rollout_kernel import (
                kernel_coeff_supported)

            fused = (jax.default_backend() == "tpu"
                     and kernel_coeff_supported(params))
        self.fused = bool(fused)
        if self.fused:
            from aircraft_tpu.solvers.fused import make_fused_solver

            self._fused_solve = make_fused_solver(
                self.ocp, self._spec, num_nodes, self.solver_config)
        else:
            self._fused_solve = None
        self.dual_carry = dual_carry
        # the transient gate on the dual carry (ocp.shift_al_state decay):
        # a window whose violation exceeds `carry_gate` hands COLD duals to
        # the next window — its multiplier estimates were integrating an
        # infeasibility transient, not approximating λ* (the frozen-course
        # failure mode, round-3 verdict #6).  Raw-row units: steady windows
        # sit at ~0.01–1, genuine transients at 38–56 on the course entry.
        self.carry_gate = carry_gate
        self._solve = jax.jit(
            lambda z0, us: ilqr.solve(self.ocp, z0, us, self.solver_config)
        )
        if self.fused:
            self._solve_batch = jax.jit(
                lambda z0s, uss, als=None: self._fused_solve(z0s, uss, als))
        else:
            self._solve_batch = jax.jit(
                lambda z0s, uss, als=None: ilqr.solve_batch(
                    self.ocp, z0s, uss, self.solver_config, al_inits=als)
            )

        def _gated_decay(violation):
            # shared implementation (solvers/ocp.gated_decay) — the bench
            # chain and serve mode gate through the same function
            return ocp_mod.gated_decay(violation, self.carry_gate)

        self._gated_decay = _gated_decay
        self._shift_al_batch = jax.jit(jax.vmap(
            lambda a, viol: ocp_mod.shift_al_state(
                a, self.commit, mu0=self.solver_config.penalty_init,
                decay=_gated_decay(viol))))
        # cold-start multiplier template: zero duals at the initial penalty
        # (what every solve starts from without a carry)
        self._al0 = ocp_mod.init_al_state(
            self.ocp, jnp.zeros(14, jnp.float32), jnp.zeros(7, jnp.float32),
            num_nodes, mu0=self.solver_config.penalty_init)

        def _serve_step(z0, us, al):
            # one window solve whose host-visible results come back as ONE
            # packed blob — a single D2H transfer per replan.  Per-field
            # np.asarray/float() pulls cost ~117 ms/window through a remote
            # device transport vs ~25 ms for the packed transfer (measured
            # on v5e, BENCH_MODE=serve); the warm-start carry (z, us, AL
            # duals) never leaves the device either way.
            c = self.commit
            if self.fused:
                sol1 = self._fused_solve(
                    z0[None], us[None],
                    (jax.tree.map(lambda t: t[None], al)
                     if self.dual_carry else None))
                sol = jax.tree.map(lambda t: t[0], sol1)
            else:
                sol = ilqr.solve_impl(self.ocp, z0, us, self.solver_config,
                                      al_init=al if self.dual_carry else None)
            z_next = sol.xs[c]
            us_next = jnp.concatenate(
                [sol.us[c:], jnp.tile(sol.us[-1:], (c, 1))], axis=0)
            # receding-horizon DUAL warm start (the IPOPT warm-start pushes,
            # reference config.py:46-49): shift the stage multipliers by the
            # committed prefix, restart the penalty; infeasible windows hand
            # cold duals forward (carry_gate — see __init__)
            al_next = ocp_mod.shift_al_state(
                sol.al, c, mu0=self.solver_config.penalty_init,
                decay=_gated_decay(sol.violation))
            finite = jnp.all(jnp.isfinite(sol.xs)).astype(jnp.float32)
            blob = jnp.concatenate([
                sol.xs[1 : c + 1, :14].reshape(-1),
                sol.us[:c].reshape(-1),
                jnp.stack([sol.cost, sol.violation, finite,
                           sol.xs[c, 13]]).astype(jnp.float32),
            ])
            return z_next, us_next, al_next, blob

        self._serve_step = jax.jit(_serve_step)

        def _serve_step_multi(z0, us_carry, us_reset, al, n_candidates):
            # TPU-shaped robustness: the chip is underutilised at batch 1,
            # so a window solve from up to SIX diverse warm starts (shifted
            # carry, clean trim reset, their blends, a damped carry) costs
            # barely more wall than one — and every window commits the best
            # basin found.  Marginal windows (turnaround entries near the
            # envelope floor) are chaotic under fixed-trip-count solves: a
            # poisoned carry that costs the mission on one backend flies
            # fine on another (observed CPU vs TPU); candidate diversity
            # removes that sensitivity instead of chasing bit-parity.
            c = self.commit
            candidates = [
                us_carry,
                us_reset,
                0.5 * (us_carry + us_reset),
                0.25 * us_carry + 0.75 * us_reset,
                0.75 * us_carry + 0.25 * us_reset,
                0.5 * us_carry + 0.5 * jnp.mean(us_carry, axis=0,
                                                keepdims=True),
            ]
            us_stack = jnp.stack(candidates[:n_candidates])
            nc = us_stack.shape[0]
            z_stack = jnp.tile(z0[None], (nc, 1))
            if self.dual_carry:
                # carried duals for the carry-derived candidates, cold duals
                # for the clean reset (candidate 1): a reset warm start with
                # a poisoned active set would defeat its purpose
                al_stack = jax.tree.map(
                    lambda a, b: jnp.stack([a, b, a, a, a, a][:nc]),
                    al, self._al0)
            else:
                al_stack = None
            if self.fused:
                sols = self._fused_solve(z_stack, us_stack, al_stack)
            else:
                sols = ilqr.solve_batch(self.ocp, z_stack, us_stack,
                                        self.solver_config,
                                        al_inits=al_stack)
            finite = jax.vmap(
                lambda xs: jnp.all(jnp.isfinite(xs))
            )(sols.xs).astype(jnp.float32)
            # feasibility first, then cost; diverged candidates last
            score = (jnp.nan_to_num(sols.cost, nan=jnp.inf)
                     + 100.0 * jnp.nan_to_num(sols.violation, nan=jnp.inf)
                     + jnp.where(finite > 0, 0.0, jnp.inf))
            b = jnp.argmin(score)
            xs, us = sols.xs[b], sols.us[b]
            z_next = xs[c]
            us_next = jnp.concatenate(
                [us[c:], jnp.tile(us[-1:], (c, 1))], axis=0)
            al_next = ocp_mod.shift_al_state(
                jax.tree.map(lambda t: t[b], sols.al), c,
                mu0=self.solver_config.penalty_init,
                decay=_gated_decay(sols.violation[b]))
            blob = jnp.concatenate([
                xs[1 : c + 1, :14].reshape(-1),
                us[:c].reshape(-1),
                jnp.stack([sols.cost[b], sols.violation[b], finite[b],
                           xs[c, 13]]).astype(jnp.float32),
            ])
            return z_next, us_next, al_next, blob

        self._serve_step_multi = jax.jit(_serve_step_multi,
                                         static_argnums=4)

    def _al0_batch(self, B: int):
        """Cold multipliers tiled over a scenario batch."""
        return jax.tree.map(
            lambda t: jnp.tile(t[None], (B,) + (1,) * t.ndim), self._al0)

    def diagnose_window(self, z0: jax.Array, us: jax.Array) -> dict:
        """Full post-mortem of one window solve (the reference's
        `AircraftControl.log` diagnostics, reference control/aircraft.py:81-147):
        re-solves the window to recover the complete ILQRSolution (the
        serving path only pulls a packed blob) and reports active
        constraints with duals, Quu conditioning, defects, and envelope
        traces.  Costs one extra solve — called only off the hot path
        (the abort handler, or interactively)."""
        from aircraft_tpu import observability as obs
        from aircraft_tpu.control.aircraft import envelope_registry

        sol = self._solve(jnp.asarray(z0, jnp.float32),
                          jnp.asarray(us, jnp.float32))
        report = obs.diagnose(sol, self.ocp, registry=envelope_registry(),
                              params=self.params)
        report["text"] = obs.format_diagnosis(report)
        return report

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
        al = self._al0_batch(B) if self.dual_carry else None
        windows = 0
        progress_hist = [np.asarray(s)]

        while windows < max_windows and float(jnp.min(s)) < progress_target:
            z0s = jnp.concatenate([x, s[:, None]], axis=-1)
            sols = self._solve_batch(z0s, us, al)
            c = self.commit
            x = sols.xs[:, c, :13]
            s = jnp.maximum(s, sols.xs[:, c, 13])
            us = jnp.concatenate(
                [sols.us[:, c:], jnp.tile(sols.us[:, -1:], (1, c, 1))], axis=1
            )
            if self.dual_carry:
                al = self._shift_al_batch(sols.al, sols.violation)
            windows += 1
            progress_hist.append(np.asarray(s))

        return {
            "progress": np.asarray(s),
            "windows": windows,
            "success_rate": float(np.mean(np.asarray(s) >= progress_target)),
            "progress_history": np.stack(progress_hist),
        }

    def run_batch_scan(
        self,
        x0s: jax.Array,            # (B, 13)
        n_windows: int,
        *,
        s0s=None,                  # (B,) initial progress
    ) -> dict:
        """Fully on-device receding-horizon chain: `n_windows` MPC windows
        as ONE `lax.scan`-over-windows program (solve -> commit -> shift-
        and-hold carry, all traced).  The serving shape for deployment: a
        single compiled executable advances every scenario by a window per
        step with zero host involvement — no per-window dispatch, no
        Python between replans.  `run_batch` (host loop) remains the
        flexible variant with early stopping and history capture.
        """
        B = x0s.shape[0]
        c = self.commit
        x = jnp.asarray(x0s, dtype=jnp.float32)
        s = (jnp.zeros(B, dtype=jnp.float32) if s0s is None
             else jnp.asarray(s0s, dtype=jnp.float32))
        us = jnp.zeros((B, self.N, 7), dtype=jnp.float32)
        al = self._al0_batch(B) if self.dual_carry else None

        def window(carry, _):
            x, s, us, al = carry
            z0s = jnp.concatenate([x, s[:, None]], axis=-1)
            sols = ilqr.solve_batch(self.ocp, z0s, us, self.solver_config,
                                    al_inits=al)
            x_next = sols.xs[:, c, :13]
            s_next = jnp.maximum(s, sols.xs[:, c, 13])
            us_next = jnp.concatenate(
                [sols.us[:, c:], jnp.tile(sols.us[:, -1:], (1, c, 1))],
                axis=1,
            )
            al_next = (jax.vmap(lambda a, viol: ocp_mod.shift_al_state(
                a, c, mu0=self.solver_config.penalty_init,
                decay=self._gated_decay(viol)))(sols.al, sols.violation)
                if self.dual_carry else None)
            return (x_next, s_next, us_next, al_next), s_next

        @jax.jit
        def chain(x, s, us, al):
            return jax.lax.scan(window, (x, s, us, al), None,
                                length=n_windows)

        (x, s, us, al), s_hist = chain(x, s, us, al)
        return {
            "progress": np.asarray(s),
            "windows": n_windows,
            "success_rate": float(np.mean(np.asarray(s) >= 0.99)),
            "progress_history": np.asarray(s_hist),
            "final_states": np.asarray(x),
        }

    def run(
        self,
        x0: jax.Array,
        *,
        s0: float = 0.0,
        max_windows: int = 200,
        progress_target: float = 0.99,
        us_init: Optional[jax.Array] = None,
        verbose: bool = False,
        recorder=None,
        abort_violation: float = 50.0,
        abort_patience: int = 2,
        n_candidates: int = 1,
        pipeline: bool = True,
        diagnose_on_abort: bool = True,
    ) -> dict:
        """Closed-loop MPC until the track is consumed
        (reference main/mhe/mhtt.py:79-124).  ``us_init`` seeds the first
        window (e.g. trim controls tiled over the horizon — a cold zero
        start can commit a destabilising first window before the warm-start
        carry takes over).

        ``recorder``: optional ``native.telemetry.TelemetryRecorder`` with
        ``FLIGHT_REC_FLOATS``-wide records; each committed window is pushed
        asynchronously (never blocks the replan loop — the structural fix
        for the reference's in-callback logging, SURVEY §6).

        Abort policy: non-finite states abort immediately; a window whose
        constraint violation exceeds ``abort_violation`` only aborts after
        ``abort_patience`` CONSECUTIVE such windows.  A single marginal
        window (e.g. an aggressive turnaround entry) routinely recovers on
        the next replan — with patience 1 a transient spike kills an
        otherwise-flyable mission (observed on TPU, where matmul-precision
        differences perturb exactly those marginal windows), hence the
        hardware-validated default of 2.

        Retry policy (SURVEY §5.3: bounded retries with reset
        initialisation): a window whose violation exceeds
        ``abort_violation`` is re-solved ONCE from the clean ``us_init``
        warm start (the shift-and-hold carry is the usual culprit — it can
        hand a marginal window a poisoned basin); the better of the two
        solves is committed.  Costs one extra solve only on bad windows.

        ``n_candidates > 1`` (requires ``us_init``): EVERY window solves
        from up to 6 warm starts at once (shifted carry, trim reset,
        blends, damped carry) as one tiny batch and commits the best —
        near-zero marginal wall on a TPU chip that is underutilised at
        batch 1, and it de-chaoses the marginal windows instead of
        retrying after the fact.

        ``pipeline`` (default on): window w+1's solve is DISPATCHED from
        the on-device warm-start carry before window w's commit blob is
        pulled to the host, so the D2H transfer + host bookkeeping +
        telemetry push all ride under the next solve instead of on the
        replan critical path (measured ~25 ms/window through this
        environment's remote device transport).  Commits are identical to
        the synchronous loop — only the overlap changes; an abort or
        retry discards at most one speculative solve."""
        us = (jnp.zeros((self.N, 7), dtype=jnp.float32) if us_init is None
              else jnp.asarray(us_init, dtype=jnp.float32))
        x = jnp.asarray(x0, dtype=jnp.float32)
        z = jnp.concatenate([x, jnp.asarray([s0], dtype=jnp.float32)])
        s = float(s0)
        c = self.commit

        committed_states = [np.asarray(x)]
        committed_controls = []
        windows = 0
        success = True
        viol_streak = 0
        retries = 0
        abort_reason = None
        diagnosis = None
        # per-window replan cadence (time between consecutive host-side
        # commits) — the real-time accounting the course artifacts need
        # (round-4 verdict #4/#6: a course wall number without per-window
        # cadence + compile split is uninterpretable)
        import time as _time
        window_walls = []
        t_loop0 = _time.time()
        t_prev = t_loop0
        verbose_every = 1 if (isinstance(verbose, int) and verbose > 1) else 10

        al = self._al0

        def _dispatch(z_c, us_c_, al_c):
            # the carry stays on device; everything the host needs arrives
            # in one packed blob (see _serve_step)
            if n_candidates > 1 and us_init is not None:
                return self._serve_step_multi(
                    z_c, us_c_, jnp.asarray(us_init, dtype=jnp.float32),
                    al_c, min(int(n_candidates), 6))
            return self._serve_step(z_c, us_c_, al_c)

        # guard the speculative pre-loop dispatch with the loop condition —
        # a call that would not enter the loop must not pay a window solve
        # (on the TPU tunnel that can be a multi-minute first compile)
        pending = (
            _dispatch(z, us, al)
            if pipeline and s < progress_target and max_windows > 0
            else None
        )

        while s < progress_target and windows < max_windows:
            if pipeline:
                z_new, us_new, al_new, blob = pending
                # speculative dispatch of the NEXT window from this
                # window's on-device carry — the blob pull below (and the
                # host bookkeeping after it) overlaps with that solve
                pending = _dispatch(z_new, us_new, al_new)
                host = np.asarray(blob)
            else:
                z_new, us_new, al_new, blob = _dispatch(z, us, al)
                host = np.asarray(blob)
            # blob tail layout: [cost, violation, finite, s_next]
            if (n_candidates <= 1 and us_init is not None
                    and host[-3] > abort_violation):
                # bounded retry from the clean warm start (clean duals too —
                # a poisoned carry is the usual culprit)
                z_r, us_r, al_r, blob_r = self._serve_step(
                    z, jnp.asarray(us_init, dtype=jnp.float32), self._al0)
                host_r = np.asarray(blob_r)
                if host_r[-3] < host[-3]:
                    z_new, us_new, al_new, host = z_r, us_r, al_r, host_r
                    retries += 1
                    if pipeline:
                        # the speculative dispatch used the rejected carry
                        pending = _dispatch(z_new, us_new, al_new)
            xs14 = host[: c * 14].reshape(c, 14)
            us_c = host[c * 14 : c * 21].reshape(c, 7)
            cost, violation, finite, s_next = host[-4:]
            if verbose and windows % verbose_every == 0:
                _v = float(np.linalg.norm(xs14[-1, 3:6]))
                x_h = committed_states[-1][-1] if windows else np.asarray(x0)
                print(
                    f"  window {windows}: s={s:.3f} viol={violation:.2f} "
                    f"pos=({x_h[0]:.0f},{x_h[1]:.0f},{x_h[2]:.0f}) "
                    f"v={_v:.1f}", flush=True,
                )
            # abort only on divergence or PERSISTENT gross infeasibility
            # (reference breaks on IPOPT failure, main/mhe/mhtt.py:82-84);
            # small envelope residuals are expected mid-flight under warm AL
            if finite != 1.0:
                success = False
                abort_reason = "divergence"
                if diagnose_on_abort:
                    # re-solve the failed window for the full solution and
                    # let it explain itself (reference AircraftControl.log)
                    diagnosis = self.diagnose_window(z, us)
                break
            viol_streak = viol_streak + 1 if violation > abort_violation else 0
            if viol_streak >= abort_patience:
                success = False
                abort_reason = (
                    f"violation_streak ({viol_streak} windows > "
                    f"{abort_violation}, last {violation:.1f})"
                )
                if diagnose_on_abort:
                    diagnosis = self.diagnose_window(z, us)
                break
            # commit the non-overlap prefix
            committed_controls.append(us_c)
            committed_states.append(xs14[:, :13])
            if recorder is not None:
                from aircraft_tpu.native.telemetry import flight_records

                recorder.push(flight_records(
                    windows, xs14[:, :13], us_c, xs14[:, 13],
                    float(cost), float(violation),
                ))
            # shift-and-hold warm start (reference warm-start carry)
            z, us, al = z_new, us_new, al_new
            s = float(s_next)
            windows += 1
            t_now = _time.time()
            window_walls.append(t_now - t_prev)
            t_prev = t_now

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
            "abort_reason": abort_reason,
            "diagnosis": diagnosis,
            "retries": retries,
            # cadence fields: window 0 carries the (possibly multi-minute)
            # compile through the remote tunnel; steady state is the rest
            "window_walls_s": window_walls,
            "first_window_wall_s": (window_walls[0] if window_walls
                                    else None),
            "p50_window_wall_s": (float(np.percentile(window_walls[1:], 50))
                                  if len(window_walls) > 1 else None),
            "p90_window_wall_s": (float(np.percentile(window_walls[1:], 90))
                                  if len(window_walls) > 1 else None),
        }
