"""Optimal-control-problem description consumed by the batched solvers.

The reference builds an `ca.Opti` NLP node-by-node (reference
control/base.py:339-443); here a problem is four pure functions over
(state, control, knot-index) plus a dynamics step.  Everything the solver
needs — derivatives, quadratic expansions, constraint Jacobians — is
derived from these by JAX transforms, so defining a new controller is
writing plain array code (the role of subclassing `ControlProblem`).

Constraint convention:
  * `eq(x, u, k) = 0`
  * `ineq(x, u, k) <= 0`
Both must return fixed-size vectors (pad with zeros if a constraint is
inactive at some knots — XLA needs static shapes).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct


def _zero_vec(x, u, k):
    return jnp.zeros((0,), dtype=x.dtype)


def _zero_vec_term(x):
    return jnp.zeros((0,), dtype=x.dtype)


@struct.dataclass
class OCPFunctions:
    """Bundle of problem callables. Static pytree (callables are leaves of
    metadata, not arrays), so it can be closed over by jitted solvers."""

    step: Callable = struct.field(pytree_node=False)            # (x, u, k) -> x_next
    stage_cost: Callable = struct.field(pytree_node=False)      # (x, u, k) -> scalar
    terminal_cost: Callable = struct.field(pytree_node=False)   # (x) -> scalar
    ineq: Callable = struct.field(pytree_node=False, default=_zero_vec)
    eq: Callable = struct.field(pytree_node=False, default=_zero_vec)
    terminal_ineq: Callable = struct.field(pytree_node=False, default=_zero_vec_term)
    terminal_eq: Callable = struct.field(pytree_node=False, default=_zero_vec_term)
    # per-channel feedback mask (tuple of 0/1, len = control dim) — channels
    # with 0 receive feedforward only in the line-search rollouts. Use for
    # "meta" controls (per-knot timesteps, waypoint passage impulses) where
    # state feedback destabilises the candidate rollouts.
    feedback_mask: tuple = struct.field(pytree_node=False, default=None)
    # OPTIONAL least-squares decomposition of the stage cost:
    #   stage_cost(x, u, k) == 0.5 * ||stage_residuals(x, u, k)||^2
    #                          + (stage_rest(x, u, k) if provided else 0)
    # When present, the Gauss-Newton quadraticizer builds curvature as
    # J^T J of the residuals (a jacfwd of a short vector) instead of a full
    # jax.hessian of the scalar cost — typically the dominant cost of an
    # inner iteration.  `stage_rest` collects the non-least-squares terms
    # (progress rewards etc.); it contributes its exact GRADIENT but its
    # curvature is dropped (assumed near-linear; dropping keeps the stage
    # Hessian PSD).  `stage_cost` stays the source of truth for line-search
    # cost evaluation, so an inconsistent decomposition degrades step
    # quality, never correctness of the accepted cost.
    stage_residuals: Callable = struct.field(pytree_node=False, default=None)
    stage_rest: Callable = struct.field(pytree_node=False, default=None)
    # set by `squash_controls`: the (squash, unsquash) pair of the tanh
    # control-box reparameterization.  Carried ON the bundle so warm-start
    # producers use the same transform instance as the solve — independently
    # reconstructing the maps from config bounds is a silent-desync risk if
    # the bounds source or margin ever diverges (round-3 advisor).  None on
    # problems whose control space is physical.
    control_squash: Callable = struct.field(pytree_node=False, default=None)
    control_unsquash: Callable = struct.field(pytree_node=False, default=None)
    # NOTE on control boxes: a projected (clamped) line search was tried
    # for exact box feasibility (control-limited iLQR without the boxQP
    # backward pass) and REJECTED on measurement: clamping alone starves
    # the Riccati step of its predicted decrease through the saturated
    # channels and the serving chain collapses (violations 0.1 -> 150,
    # fleet speeds 32 -> 16 m/s over 12 windows).  Box rows stay in `ineq`
    # under the AL, which prices them to ~1e-2 within a 4-round schedule.


def make_squash_maps(lb, ub, *, margin: float = 0.999):
    """(squash, unsquash) pair for a control box — see `squash_controls`."""
    lb = jnp.asarray(lb, jnp.float32)
    ub = jnp.asarray(ub, jnp.float32)
    mid = 0.5 * (lb + ub)
    half = 0.5 * (ub - lb)
    safe_half = jnp.where(half > 0, half, 1.0)

    def squash(w):
        return mid + half * jnp.tanh(w)

    def unsquash(u):
        t = jnp.clip((u - mid) / safe_half, -margin, margin)
        return jnp.arctanh(t) * jnp.where(half > 0, 1.0, 0.0)

    return squash, unsquash


def squash_controls(ocp: OCPFunctions, lb, ub, *, margin: float = 0.999):
    """Reparameterize the controls through a tanh squash so the control box
    is satisfied EXACTLY by construction (control-limited iLQR via smooth
    saturation).  The solver optimizes the unconstrained pre-image w; the
    plant, costs and constraints all see u = mid + half·tanh(w).

    Why: under the AL the box rows are the measured steady-state violation
    floor of the receding-horizon serving chain (flaps/rudder/elevator rows
    0.4–2.0 normalized units over at the 2×6 budget, still 0.3–0.6 at
    4×20 — the tracking cost keeps paying the penalty for authority the box
    forbids, and the capped dual carry never prices it out).  Squashing
    removes those 14 rows outright.  Compared with the REJECTED projected
    line search (see NOTE above), the Riccati step keeps a live, consistent
    derivative through saturating channels — predicted decrease stays
    exact, it just flattens as a channel saturates.  (The reference hands
    its box to IPOPT's native bound handling, reference
    control/aircraft.py:29-41; this is the iLQR-native equivalent.)

    Degenerate channels (lb == ub) pin to the midpoint with zero gradient —
    the correct frozen-channel behavior.

    Returns (squashed_ocp, squash, unsquash).  `unsquash` maps a physical
    warm start into w-space, clipping to `margin` of the half-span so
    atanh stays finite at the bounds.
    """
    squash, unsquash = make_squash_maps(lb, ub, margin=margin)

    def wrap(f):
        if f is None:
            return None
        return lambda x, w, k: f(x, squash(w), k)

    squashed = ocp.replace(
        step=wrap(ocp.step),
        stage_cost=wrap(ocp.stage_cost),
        ineq=wrap(ocp.ineq),
        eq=wrap(ocp.eq),
        stage_residuals=wrap(ocp.stage_residuals),
        stage_rest=wrap(ocp.stage_rest),
        # carried on the bundle so warm-start producers use THIS transform
        # instance (see OCPFunctions.control_squash)
        control_squash=squash,
        control_unsquash=unsquash,
    )
    return squashed, squash, unsquash


@struct.dataclass
class ALState:
    """Augmented-Lagrangian multipliers/penalty for one trajectory."""

    lam_ineq: jax.Array      # (N, n_ineq)
    lam_eq: jax.Array        # (N, n_eq)
    lam_t_ineq: jax.Array    # (n_t_ineq,)
    lam_t_eq: jax.Array      # (n_t_eq,)
    mu: jax.Array            # scalar penalty
    # per-ROW multiplicative penalty factors for the stage inequalities
    # (LANCELOT-style differential penalties): the effective penalty of
    # stage-ineq row i is mu * mu_row[i].  Stays all-ones (bit-identical
    # to the scalar scheme) unless SolverConfig.penalty_per_row escalates
    # rows that remain violated after a multiplier update.  Carried across
    # receding-horizon windows by shift_al_state, so a persistently-active
    # row (e.g. a control-box channel the cost wants to exploit) gets
    # priced to target without stiffening the whole problem — uniformly
    # carrying mu=1e4 collapsed the serving chain (violations 0.1 -> 150),
    # while per-row ratcheting leaves the tracking dynamics gentle.
    mu_row: jax.Array = None  # (n_ineq,)


def init_al_state(ocp: OCPFunctions, x0: jax.Array, u0: jax.Array, N: int,
                  mu0: float = 10.0) -> ALState:
    n_ineq = ocp.ineq(x0, u0, 0).shape[-1]
    n_eq = ocp.eq(x0, u0, 0).shape[-1]
    n_ti = ocp.terminal_ineq(x0).shape[-1]
    n_te = ocp.terminal_eq(x0).shape[-1]
    z = jnp.zeros
    return ALState(
        lam_ineq=z((N, n_ineq)),
        lam_eq=z((N, n_eq)),
        lam_t_ineq=z((n_ti,)),
        lam_t_eq=z((n_te,)),
        mu=jnp.asarray(mu0),
        mu_row=jnp.ones((n_ineq,)),
    )


def shift_al_state(al: ALState, commit: int, mu0: float = 10.0,
                   lam_max: float = 1e3, decay=1.0) -> ALState:
    """Receding-horizon dual warm start: shift the stage multipliers by the
    committed prefix (hold the tail), keep the terminal multipliers, and
    restart the penalty at ``mu0``.  The IPOPT warm-start analogue
    (reference config.py:46-49 warm_start_init_point / warm-start pushes):
    the next window's active set largely overlaps the previous window's
    tail, so its multiplier estimates start near the solution instead of at
    zero.  Measured (tests/test_control.py::TestDualWarmStart, 12-window
    N=25 chain, 2 AL x 10 inner iterations): steady-state mean violation
    0.080 -> 0.044, a ~1.8x cut at zero extra iterations; consumed by
    MHTT serving (control/mhtt.py) and the bench.py window chain.

    ``lam_max`` caps the carried multipliers (IPOPT's warm-start bound
    pushes play the same safeguarding role): a row that stays active with
    residual violation grows its λ by μ·g EVERY window with no decay, and
    over a long flight the unbounded dual dominates the true cost —
    measured on the 400-window TPU course: the airspeed-floor dual
    accumulated through the energy-bleed transient until window solutions
    dived for speed (59 m/s), missed the turnaround, and froze the flight
    at s=0.18.  λ* is finite (order of the cost gradient, ~10–100 here);
    1e3 caps runaway without touching healthy duals.

    ``decay`` (scalar or traced, default 1.0 = carry verbatim) scales the
    carried multipliers — the TRANSIENT gate.  The cap alone is not enough:
    during a long transiently-infeasible stretch an active row's λ grows by
    μ·g every window toward the cap, and the accumulated dual then demands
    a constraint margin of λ/μ ≫ 0 once feasibility returns (the frozen-
    course failure mode above).  Callers gate on the WINDOW'S OWN
    feasibility: carry duals from windows that solved clean (the
    steady-state 1.8× win), restart them cold after an infeasible window —
    where the dual estimate integrates an infeasibility transient instead
    of approximating λ* — the cross-window analogue of the within-solve
    rule 'update multipliers only when the violation decreased, otherwise
    raise the penalty' (Conn–Gould–Toint).  See MHTT ``carry_gate`` and
    tests/test_ilqr.py::TestDualCarryGate."""
    def _shift(lam):
        lam = jnp.clip(lam * decay, -lam_max, lam_max)
        return jnp.concatenate(
            [lam[commit:], jnp.tile(lam[-1:], (commit, 1))], axis=0)

    return ALState(
        lam_ineq=_shift(al.lam_ineq),
        lam_eq=_shift(al.lam_eq),
        lam_t_ineq=al.lam_t_ineq * decay,
        lam_t_eq=al.lam_t_eq * decay,
        mu=jnp.asarray(mu0, dtype=al.mu.dtype),
        # per-row factors are window-position-free — carry them verbatim
        # (this is the cross-window ratchet; see ALState.mu_row)
        mu_row=al.mu_row,
    )


def gated_decay(violation, gate):
    """THE violation gate on the receding-horizon dual carry — one
    implementation for every consumer (MHTT serving, the closed-loop
    course, the bench headline chain, and bench serve mode).

    Returns the ``decay`` factor for `shift_al_state`: 1.0 (carry the
    multipliers verbatim) when the window solved to within ``gate``,
    0.0 (hand cold duals forward) when it did not — the cross-window
    analogue of 'update multipliers only when the violation decreased'
    (Conn–Gould–Toint; see shift_al_state docstring and
    tests/test_ilqr.py::TestDualCarryGate).  Round-4 lesson: the one
    consumer that skipped the gate (bench serve mode) shipped an artifact
    recording a stalled flight — the ungated carry integrated duals
    through the entry transient exactly as the course had measured."""
    return (violation <= gate).astype(jnp.float32)


def al_stage_cost(ocp: OCPFunctions, al: ALState, x, u, k):
    """Stage cost + AL penalty terms.

    Inequalities use the standard PHR form: active when g + λ/μ > 0;
    per-row effective penalty μᵢ = mu · mu_row[i] (see ALState.mu_row)."""
    c = ocp.stage_cost(x, u, k)
    g = ocp.ineq(x, u, k)
    h = ocp.eq(x, u, k)
    lam_g = al.lam_ineq[k]
    lam_h = al.lam_eq[k]
    mu = al.mu
    mu_g = mu * al.mu_row
    gplus = jnp.maximum(g + lam_g / mu_g, 0.0)
    c = c + 0.5 * jnp.sum(mu_g * gplus * gplus) - 0.5 * jnp.sum(lam_g * lam_g / mu_g)
    c = c + jnp.sum(lam_h * h) + 0.5 * mu * jnp.sum(h * h)
    return c


def al_terminal_cost(ocp: OCPFunctions, al: ALState, x):
    c = ocp.terminal_cost(x)
    g = ocp.terminal_ineq(x)
    h = ocp.terminal_eq(x)
    mu = al.mu
    gplus = jnp.maximum(g + al.lam_t_ineq / mu, 0.0)
    c = c + 0.5 * mu * jnp.sum(gplus * gplus) - 0.5 * jnp.sum(al.lam_t_ineq**2) / mu
    c = c + jnp.sum(al.lam_t_eq * h) + 0.5 * mu * jnp.sum(h * h)
    return c


def al_total_cost(ocp: OCPFunctions, al: ALState, xs, us):
    N = us.shape[0]
    ks = jnp.arange(N)
    stage = jax.vmap(lambda x, u, k: al_stage_cost(ocp, al, x, u, k))(xs[:-1], us, ks)
    return jnp.sum(stage) + al_terminal_cost(ocp, al, xs[-1])


def true_cost(ocp: OCPFunctions, xs, us):
    N = us.shape[0]
    ks = jnp.arange(N)
    stage = jax.vmap(lambda x, u, k: ocp.stage_cost(x, u, k))(xs[:-1], us, ks)
    return jnp.sum(stage) + ocp.terminal_cost(xs[-1])


def rollout_defect(ocp: OCPFunctions, xs, us):
    """Max dynamics defect ‖x_{k+1} − F(x_k, u_k)‖∞ along a trajectory —
    the integrity check that (xs, us) is a TRUE rollout.  Single-shooting
    iterates satisfy this by construction; seeds passed through
    `ilqr.solve_impl(xs_init=...)` may not, and a returned iterate that
    kept its seed must be gated on this before being trusted (the
    reference's multiple-shooting defect rows play the same role,
    reference control/base.py:275-286)."""
    N = us.shape[0]
    ks = jnp.arange(N)
    nxt = jax.vmap(lambda x, u, k: ocp.step(x, u, k))(xs[:-1], us, ks)
    return jnp.max(jnp.abs(nxt - xs[1:]))


def max_violation(ocp: OCPFunctions, xs, us):
    """Worst constraint violation along the trajectory — the solver's
    `constr_viol_tol` analogue (reference config.py:25)."""
    N = us.shape[0]
    ks = jnp.arange(N)

    def stage_viol(x, u, k):
        g = ocp.ineq(x, u, k)
        h = ocp.eq(x, u, k)
        vg = jnp.max(jnp.maximum(g, 0.0), initial=0.0)
        vh = jnp.max(jnp.abs(h), initial=0.0)
        return jnp.maximum(vg, vh)

    v = jnp.max(jax.vmap(stage_viol)(xs[:-1], us, ks), initial=0.0)
    vt = jnp.maximum(
        jnp.max(jnp.maximum(ocp.terminal_ineq(xs[-1]), 0.0), initial=0.0),
        jnp.max(jnp.abs(ocp.terminal_eq(xs[-1])), initial=0.0),
    )
    return jnp.maximum(v, vt)


def update_multipliers(ocp: OCPFunctions, al: ALState, xs, us,
                       penalty_scale: float, penalty_max: float,
                       row_adapt: bool = False, row_scale: float = 10.0,
                       row_max: float = 1e3,
                       row_target: float = 1e-2) -> ALState:
    """First-order multiplier update + penalty increase (outer AL step).

    ``row_adapt`` additionally escalates the PER-ROW factor of every stage
    inequality row whose worst-over-the-horizon violation still exceeds
    ``row_target`` (LANCELOT-style differential penalties; see
    ALState.mu_row).  Rows at target keep their factor — no decay, so a
    factor ratcheted up in one receding-horizon window stays priced in the
    next."""
    N = us.shape[0]
    ks = jnp.arange(N)
    mu = al.mu
    mu_g = mu * al.mu_row

    def upd(x, u, k):
        g = ocp.ineq(x, u, k)
        h = ocp.eq(x, u, k)
        return (
            jnp.maximum(al.lam_ineq[k] + mu_g * g, 0.0),
            al.lam_eq[k] + mu * h,
            jnp.maximum(g, 0.0),
        )

    lam_ineq, lam_eq, gplus = jax.vmap(upd)(xs[:-1], us, ks)
    lam_t_ineq = jnp.maximum(al.lam_t_ineq + mu * ocp.terminal_ineq(xs[-1]), 0.0)
    lam_t_eq = al.lam_t_eq + mu * ocp.terminal_eq(xs[-1])
    if row_adapt:
        v_row = jnp.max(gplus, axis=0)  # worst violation per row
        mu_row = jnp.where(
            v_row > row_target,
            jnp.minimum(al.mu_row * row_scale, row_max),
            al.mu_row,
        )
    else:
        mu_row = al.mu_row
    return ALState(
        lam_ineq=lam_ineq,
        lam_eq=lam_eq,
        lam_t_ineq=lam_t_ineq,
        lam_t_eq=lam_t_eq,
        mu=jnp.minimum(mu * penalty_scale, penalty_max),
        mu_row=mu_row,
    )
