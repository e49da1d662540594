"""Batched augmented-Lagrangian iLQR — the TPU-native NLP solver.

Replaces the reference's IPOPT/MUMPS pair (reference control/base.py:455-477,
config.py:23-54) with a purpose-built solver whose every step is a fused XLA
program:

  * dynamics sensitivities  A_k, B_k   — `jax.jacfwd` of the RK4 step
  * cost/constraint curvature          — `jax.grad`/`jax.hessian` of the
                                          AL stage cost (role of nlp_hess_l)
  * KKT factorisation                  — Riccati backward `lax.scan`
                                          (role of MUMPS on the block-tridiagonal
                                          KKT system)
  * line search                        — K candidate step sizes rolled out
                                          in parallel via `vmap` (TPU-friendly:
                                          no data-dependent branching)
  * constraints                        — PHR augmented Lagrangian with
                                          scheduled penalty tightening
                                          (role of IPOPT's barrier)

The whole solve is one jittable pure function of (x0, u_init, multipliers),
so `vmap` turns it into thousands of simultaneous MPC solves per chip and
`pjit`/`shard_map` spreads the scenario batch over a mesh.

Iteration structure is fixed-trip-count with `done` masking (no early exit)
— deliberately: a batch of scenarios shares one compiled program and
convergence is tracked per scenario (SURVEY §5.3: a failed scenario must not
poison the batch).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from aircraft_tpu.config import SolverConfig
from aircraft_tpu.solvers import ocp as ocp_mod
from aircraft_tpu.solvers import riccati as riccati_mod
from aircraft_tpu.solvers.ocp import ALState, OCPFunctions

# fixed cost penalty per frozen (diverged) rollout knot — keeps divergent
# candidates comparable instead of pricing them to +inf
FREEZE_PENALTY = 1e7


class ILQRSolution(NamedTuple):
    xs: jax.Array          # (N+1, n)
    us: jax.Array          # (N, m)
    cost: jax.Array        # true (un-augmented) cost
    violation: jax.Array   # max constraint violation
    converged: jax.Array   # bool
    iterations: jax.Array  # inner iterations actually used
    grad_norm: jax.Array   # final stationarity measure
    # final augmented-Lagrangian state: the constraint multipliers are the
    # solver's dual estimates (the reference logged IPOPT's duals per active
    # constraint, reference control/aircraft.py:120-135) — consumed by
    # observability.diagnose, free to carry (already live at solve end)
    al: ALState = None


# ---------------------------------------------------------------------------
# expansions
# ---------------------------------------------------------------------------


def _quadraticize(ocp: OCPFunctions, al: ALState, xs, us):
    """Per-knot gradients/Hessians of the AL stage cost, and the terminal
    expansion. vmapped over the horizon; XLA fuses all knots into one batch
    of small dense ops."""
    N = us.shape[0]
    ks = jnp.arange(N)

    def stage(x, u, k):
        cx = jax.grad(ocp_mod.al_stage_cost, argnums=2)(ocp, al, x, u, k)
        cu = jax.grad(ocp_mod.al_stage_cost, argnums=3)(ocp, al, x, u, k)
        cxx = jax.hessian(ocp_mod.al_stage_cost, argnums=2)(ocp, al, x, u, k)
        cuu = jax.hessian(ocp_mod.al_stage_cost, argnums=3)(ocp, al, x, u, k)
        # ∂²c/∂u∂x, shape (m, n)
        cux = jax.jacfwd(
            lambda xx: jax.grad(ocp_mod.al_stage_cost, argnums=3)(ocp, al, xx, u, k)
        )(x)
        return cx, cu, cxx, cuu, cux

    lx, lu, lxx, luu, lux = jax.vmap(stage)(xs[:-1], us, ks)
    vx = jax.grad(ocp_mod.al_terminal_cost, argnums=2)(ocp, al, xs[-1])
    vxx = jax.hessian(ocp_mod.al_terminal_cost, argnums=2)(ocp, al, xs[-1])
    return lx, lu, lxx, luu, lux, vx, vxx


def _quadraticize_gn(ocp: OCPFunctions, al: ALState, xs, us,
                     use_residuals: bool = True):
    """Gauss–Newton expansion: exact gradient of the AL, exact Hessian of
    the *cost* terms, and first-order (μ JᵀJ on the active set) curvature
    for the constraint terms.  PSD constraint curvature by construction —
    the robust choice for stiff aero models (SURVEY §7 hard part 3) — and a
    much smaller traced graph than differentiating through the constraint
    Jacobians."""
    N = us.shape[0]
    ks = jnp.arange(N)
    mu = al.mu

    def stage(x, u, k):
        if ocp.stage_residuals is not None and use_residuals:
            # least-squares curvature: J^T J of the residual vector — one
            # jacfwd of a short vector instead of two scalar Hessians
            r = ocp.stage_residuals(x, u, k)
            Jx = jax.jacfwd(lambda xx: ocp.stage_residuals(xx, u, k))(x)
            Ju = jax.jacfwd(lambda uu: ocp.stage_residuals(x, uu, k))(u)
            cx = Jx.T @ r
            cu = Ju.T @ r
            cxx = Jx.T @ Jx
            cuu = Ju.T @ Ju
            cux = Ju.T @ Jx
            if ocp.stage_rest is not None:
                # exact gradient of the non-LSQ terms; curvature dropped
                cx = cx + jax.grad(ocp.stage_rest, argnums=0)(x, u, k)
                cu = cu + jax.grad(ocp.stage_rest, argnums=1)(x, u, k)
        else:
            cx = jax.grad(ocp.stage_cost, argnums=0)(x, u, k)
            cu = jax.grad(ocp.stage_cost, argnums=1)(x, u, k)
            cxx = jax.hessian(ocp.stage_cost, argnums=0)(x, u, k)
            cuu = jax.hessian(ocp.stage_cost, argnums=1)(x, u, k)
            cux = jax.jacfwd(lambda xx: jax.grad(ocp.stage_cost, argnums=1)(xx, u, k))(x)

        # inequality block: active-set PHR (per-row penalty mu * mu_row)
        g = ocp.ineq(x, u, k)
        if g.shape[-1] > 0:
            Jgx = jax.jacfwd(lambda xx: ocp.ineq(xx, u, k))(x)
            Jgu = jax.jacfwd(lambda uu: ocp.ineq(x, uu, k))(u)
            lam = al.lam_ineq[k]
            mu_g = mu * al.mu_row
            act = (g + lam / mu_g) > 0.0
            y = jnp.where(act, lam + mu_g * g, 0.0)
            w = jnp.where(act, mu_g, 0.0)
            cx = cx + Jgx.T @ y
            cu = cu + Jgu.T @ y
            cxx = cxx + Jgx.T @ (w[:, None] * Jgx)
            cuu = cuu + Jgu.T @ (w[:, None] * Jgu)
            cux = cux + Jgu.T @ (w[:, None] * Jgx)

        # equality block
        h = ocp.eq(x, u, k)
        if h.shape[-1] > 0:
            Jhx = jax.jacfwd(lambda xx: ocp.eq(xx, u, k))(x)
            Jhu = jax.jacfwd(lambda uu: ocp.eq(x, uu, k))(u)
            yh = al.lam_eq[k] + mu * h
            cx = cx + Jhx.T @ yh
            cu = cu + Jhu.T @ yh
            cxx = cxx + mu * Jhx.T @ Jhx
            cuu = cuu + mu * Jhu.T @ Jhu
            cux = cux + mu * Jhu.T @ Jhx
        return cx, cu, cxx, cuu, cux

    lx, lu, lxx, luu, lux = jax.vmap(stage)(xs[:-1], us, ks)

    xT = xs[-1]
    vx = jax.grad(ocp.terminal_cost)(xT)
    vxx = jax.hessian(ocp.terminal_cost)(xT)
    gT = ocp.terminal_ineq(xT)
    if gT.shape[-1] > 0:
        Jg = jax.jacfwd(ocp.terminal_ineq)(xT)
        act = (gT + al.lam_t_ineq / mu) > 0.0
        y = jnp.where(act, al.lam_t_ineq + mu * gT, 0.0)
        w = jnp.where(act, mu, 0.0)
        vx = vx + Jg.T @ y
        vxx = vxx + Jg.T @ (w[:, None] * Jg)
    hT = ocp.terminal_eq(xT)
    if hT.shape[-1] > 0:
        Jh = jax.jacfwd(ocp.terminal_eq)(xT)
        yh = al.lam_t_eq + mu * hT
        vx = vx + Jh.T @ yh
        vxx = vxx + mu * Jh.T @ Jh
    return lx, lu, lxx, luu, lux, vx, vxx


# ---------------------------------------------------------------------------
# backward Riccati sweep
# ---------------------------------------------------------------------------


def _backward_pass(A, B, lx, lu, lxx, luu, lux, vx, vxx, reg,
                   mode: str = "sequential", unroll: int = 1):
    """Riccati recursion over the horizon (the factorisation step MUMPS did
    for IPOPT). Delegates to solvers/riccati.py: a sequential `lax.scan`
    or the O(log N)-depth associative-scan sweep."""
    if mode == "associative":
        return riccati_mod.backward_associative(
            A, B, lx, lu, lxx, luu, lux, vx, vxx, reg)
    return riccati_mod.backward_sequential(
        A, B, lx, lu, lxx, luu, lux, vx, vxx, reg, unroll=unroll)


# ---------------------------------------------------------------------------
# forward pass — parallel line search
# ---------------------------------------------------------------------------


def _forward_pass(ocp: OCPFunctions, al: ALState, xs_ref, us_ref, K, k,
                  alphas, unroll: int = 1):
    """Roll out every candidate step size simultaneously (vmap over α) and
    return the best trajectory by AL cost. No backtracking loop — all
    candidates are one batched scan, the TPU-shaped version of a line
    search."""
    N = us_ref.shape[0]
    ks_idx = jnp.arange(N)

    if ocp.feedback_mask is not None:
        K = K * jnp.asarray(ocp.feedback_mask, K.dtype)[None, :, None]

    def rollout(alpha):
        def body(carry, inp):
            x, nfro = carry
            u_ref, x_ref, K_k, k_k, idx = inp
            u = u_ref + alpha * k_k + K_k @ (x - x_ref)
            x_next = ocp.step(x, u, idx)
            # NaN policing (SURVEY §5.2): freeze a diverged knot in place.
            # Each frozen knot adds a large FIXED penalty to the candidate's
            # cost (not inf): trajectories transiting chaotic regimes can
            # then still be compared — a candidate that diverges LATER than
            # the incumbent is an improvement the solver may take, which is
            # how it retreats from divergence at all.
            finite = jnp.all(jnp.isfinite(x_next)) & (
                jnp.max(jnp.abs(x_next)) < 1e6
            )
            x_next = jnp.where(finite, x_next, x)
            return (x_next, nfro + (~finite)), (x_next, u)

        (_, nfro), (xs_new, us_new) = jax.lax.scan(
            body, (xs_ref[0], jnp.asarray(0)),
            (us_ref, xs_ref[:-1], K, k, ks_idx), unroll=unroll,
        )
        xs_new = jnp.concatenate([xs_ref[:1], xs_new], axis=0)
        cost = ocp_mod.al_total_cost(ocp, al, xs_new, us_new)
        cost = jnp.nan_to_num(cost, nan=jnp.inf) + FREEZE_PENALTY * nfro
        return xs_new, us_new, cost, nfro

    xs_c, us_c, costs, nfros = jax.vmap(rollout)(alphas)
    costs = jnp.where(jnp.isnan(costs), jnp.inf, costs)
    best = jnp.argmin(costs)
    return xs_c[best], us_c[best], costs[best], nfros[best]


# ---------------------------------------------------------------------------
# solver
# ---------------------------------------------------------------------------


def solve_impl(ocp: OCPFunctions, x0: jax.Array, us_init: jax.Array,
               config: SolverConfig = SolverConfig(),
               al_init: ALState = None,
               xs_init: jax.Array = None) -> ILQRSolution:
    """Unjitted solver implementation. Use this inside your own jit/vmap
    when the OCP closes over TRACED values (e.g. a per-candidate timestep
    or parameter sweep: build the OCP inside the traced function and call
    solve_impl directly). `solve` below is the jitted entry point for
    OCPs whose closures are static.

    ``al_init``: optional warm-start multipliers (the previous window's
    `ILQRSolution.al` through `ocp_mod.shift_al_state`) — the dual analogue
    of the shift-and-hold control carry in receding-horizon serving.

    ``xs_init``: optional TRAJECTORY warm start (N+1, n) used as the first
    linearization reference instead of re-rolling ``us_init`` open-loop —
    the single-shooting analogue of the reference's state guesses
    (reference control/base.py:339-385 seeds ca.Opti state variables
    directly).  Why it exists: on a chaotic plant an open-loop replay of
    even the SOLVER'S OWN solved controls can diverge from the solution
    trajectory by rounding alone (measured: a waypoint solution threading
    a post-stall dip replays to NaN, so re-seeding a solve AT its own
    solution destroyed it).  A slightly dynamics-inconsistent (xs, us)
    reference is fine: the first backward pass builds gains around it and
    the feedback forward pass closes the defects — the accepted iterate is
    always a true rollout."""
    N, m = us_init.shape
    n = x0.shape[-1]
    dtype = x0.dtype

    ks_idx = jnp.arange(N)
    alphas = jnp.concatenate(
        [jnp.logspace(0.0, -(config.line_search_steps - 2), config.line_search_steps - 1, base=2.0),
         jnp.zeros((1,))]
    ).astype(dtype)

    def initial_rollout(us):
        def body(carry, inp):
            x, nfro = carry
            u, idx = inp
            x_next = ocp.step(x, u, idx)
            # freeze divergence (incl. float32-overflow-scale magnitudes) so
            # a bad warm start still yields usable linearisation points
            ok = jnp.all(jnp.isfinite(x_next)) & (jnp.max(jnp.abs(x_next)) < 1e6)
            x_next = jnp.where(ok, x_next, x)
            return (x_next, nfro + (~ok)), x_next

        (_, nfro), xs_tail = jax.lax.scan(
            body, (x0, jnp.asarray(0)), (us, ks_idx),
            unroll=config.scan_unroll,
        )
        return jnp.concatenate([x0[None], xs_tail], axis=0), nfro

    if xs_init is None:
        xs0, nfro0 = initial_rollout(us_init)
    else:
        # seed nfro at N: the reference trajectory is not a certified
        # rollout, so its iteration-1 incumbent cost reads +N·FREEZE_PENALTY
        # and the first feedback forward pass (a TRUE rollout) is always
        # accepted — the returned iterate can then never be the
        # dynamics-inconsistent seed itself
        # row 0 pinned to the TRUE initial state: every forward pass rolls
        # from xs_ref[0], so a seed carrying its own x0 would silently
        # re-anchor the whole solve
        xs0 = jnp.asarray(xs_init, dtype).at[0].set(x0)
        nfro0 = jnp.asarray(N)
    al0 = (ocp_mod.init_al_state(ocp, x0, us_init[0], N, mu0=config.penalty_init)
           if al_init is None else al_init)

    def linearize(xs, us):
        def jac(x, u, idx):
            # two separate jacfwds, NOT one jacfwd over [x; u]: measured
            # (BENCH_MODE=phase) the fused form is a wash on TPU and ~1.7×
            # slower on CPU — XLA already CSEs the shared primal, and the
            # concatenate defeats the per-argument tangent batching
            A = jax.jacfwd(lambda xx: ocp.step(xx, u, idx))(x)
            B = jax.jacfwd(lambda uu: ocp.step(x, uu, idx))(u)
            return A, B

        A, B = jax.vmap(jac)(xs[:-1], us, ks_idx)
        # knots whose (frozen) linearisation point sits outside the model's
        # numeric range produce non-finite or astronomically large
        # sensitivities; sanitising AND clamping keeps the backward sweep in
        # float32 range so the rest of the horizon still improves
        lim = 1e6
        clean = lambda t: jnp.clip(
            jnp.nan_to_num(t, nan=0.0, posinf=0.0, neginf=0.0), -lim, lim
        )
        return clean(A), clean(B)

    def inner_iteration(carry, _):
        xs, us, nfro, al, reg, done, n_iters, grad_norm = carry
        cost_prev = (
            ocp_mod.al_total_cost(ocp, al, xs, us) + FREEZE_PENALTY * nfro
        )

        A, B = linearize(xs, us)
        if config.hessian == "gauss_newton":
            # curvature source is a per-backend performance choice, same
            # stationary point either way (see SolverConfig.use_residual_gn)
            use_res = (
                config.use_residual_gn
                if config.use_residual_gn is not None
                else jax.default_backend() != "tpu"
            )
            quad = partial(_quadraticize_gn, use_residuals=use_res)
        else:
            quad = _quadraticize
        lx, lu, lxx, luu, lux, vx, vxx = quad(ocp, al, xs, us)
        san = lambda t: jnp.clip(
            jnp.nan_to_num(t, nan=0.0, posinf=0.0, neginf=0.0), -1e8, 1e8
        )
        lx, lu, lxx, luu, lux, vx, vxx = (
            san(lx), san(lu), san(lxx), san(luu), san(lux), san(vx), san(vxx)
        )
        K, kff, dv1, dv2, qu_max, fail = _backward_pass(
            A, B, lx, lu, lxx, luu, lux, vx, vxx, reg, config.riccati,
            unroll=config.scan_unroll,
        )
        K = jnp.clip(K, -config.gain_clip, config.gain_clip)
        kff = jnp.clip(kff, -config.gain_clip, config.gain_clip)

        xs_new, us_new, cost_new, nfro_new = _forward_pass(
            ocp, al, xs, us, K, kff, alphas, unroll=config.scan_unroll)

        expected = -(dv1 + dv2)
        improved = (cost_new < cost_prev - 1e-12) & ~fail

        # trust-region-style regularisation adaptation
        reg_new = jnp.where(
            fail | ~improved,
            jnp.minimum(reg * config.reg_escalate, config.reg_max),
            jnp.maximum(reg / config.reg_relax, config.reg_init),
        )

        accept = improved & ~done
        xs = jnp.where(accept, xs_new, xs)
        us = jnp.where(accept, us_new, us)
        nfro = jnp.where(accept, nfro_new, nfro)

        # stationarity: max |Qu| over the horizon
        converged_now = (qu_max < config.tol) | (
            improved & (jnp.abs(cost_prev - cost_new) < config.tol * (1.0 + jnp.abs(cost_prev)))
        )
        done = done | (converged_now & ~fail)
        n_iters = n_iters + jnp.where(done, 0, 1)
        return (xs, us, nfro, al, reg_new, done, n_iters, qu_max), None

    def al_iteration(carry, _):
        xs, us, nfro, al, n_iters_total, grad_norm = carry
        inner0 = (xs, us, nfro, al, jnp.asarray(config.reg_init, dtype),
                  jnp.asarray(False), jnp.asarray(0), jnp.asarray(jnp.inf, dtype))
        (xs, us, nfro, al, _, _, n_inner, grad_norm), _ = jax.lax.scan(
            inner_iteration, inner0, None, length=config.max_inner_iters
        )
        al = ocp_mod.update_multipliers(
            ocp, al, xs, us, config.penalty_scale, config.penalty_max,
            row_adapt=config.penalty_per_row,
            row_scale=config.penalty_row_scale,
            row_max=config.penalty_row_max,
            row_target=config.penalty_row_target,
        )
        return (xs, us, nfro, al, n_iters_total + n_inner, grad_norm), None

    carry0 = (xs0, us_init, nfro0, al0, jnp.asarray(0), jnp.asarray(jnp.inf, dtype))
    (xs, us, nfro, al, n_iters, grad_norm), _ = jax.lax.scan(
        al_iteration, carry0, None, length=config.max_al_iters
    )

    cost = ocp_mod.true_cost(ocp, xs, us)
    viol = ocp_mod.max_violation(ocp, xs, us)
    converged = (viol < config.constraint_tol) & jnp.isfinite(cost)
    return ILQRSolution(
        xs=xs, us=us, cost=cost, violation=viol, converged=converged,
        iterations=n_iters, grad_norm=grad_norm, al=al,
    )


solve = partial(jax.jit, static_argnums=(0, 3))(solve_impl)


def solve_batch(ocp: OCPFunctions, x0s: jax.Array, us_inits: jax.Array,
                config: SolverConfig = SolverConfig(),
                al_inits: ALState = None,
                batch_minor: bool = False) -> ILQRSolution:
    """vmap of `solve` over a leading scenario axis — thousands of
    simultaneous MPC solves in one XLA program (SURVEY §2.4: the scenario
    batch is the data-parallel axis of this domain).  ``al_inits``
    optionally carries per-scenario dual warm starts (leading batch axis).

    ``batch_minor``: map over the batch as the LAST (minor-most) logical
    axis instead of the leading one.  TPU tiles the two minor dims of every
    array as (8 sublanes × 128 lanes); with the batch leading, the solver's
    per-knot tensors put their tiny 7/13-sized dims minor and pad them to
    128 lanes (~18× wasted HBM traffic and lane occupancy on every
    intermediate).  Batch-minor puts the 256-wide scenario axis on the
    lanes — the batched-small-op layout the Pallas kernels in kernels/ use
    explicitly, here requested at the whole-program level through vmap axis
    placement.  Interface unchanged: inputs/outputs still batch-leading;
    the transposes at the boundary cost one pass over the carry, paid once
    per window."""
    if batch_minor:
        mv_in = lambda t: jnp.moveaxis(t, 0, -1)
        mv_out = lambda t: (jnp.moveaxis(t, -1, 0) if t.ndim > 0 else t)
        alT = (jax.tree.map(mv_in, al_inits)
               if al_inits is not None else None)
        if alT is None:
            sols = jax.vmap(
                lambda x0, us: solve(ocp, x0, us, config),
                in_axes=-1, out_axes=-1)(mv_in(x0s), mv_in(us_inits))
        else:
            sols = jax.vmap(
                lambda x0, us, al: solve(ocp, x0, us, config, al),
                in_axes=-1, out_axes=-1)(mv_in(x0s), mv_in(us_inits), alT)
        return jax.tree.map(mv_out, sols)
    if al_inits is None:
        return jax.vmap(lambda x0, us: solve(ocp, x0, us, config))(x0s, us_inits)
    return jax.vmap(lambda x0, us, al: solve(ocp, x0, us, config, al))(
        x0s, us_inits, al_inits)
