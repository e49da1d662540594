"""Fused batch-major window solver — the AL-iLQR outer loop around the
Pallas inner-iteration kernels (kernels/window_kernel.py).

`make_fused_solver(ocp, spec, N, config)` returns a drop-in replacement
for `ilqr.solve_batch` on the MHTT window formulation: same inputs (batch
of initial states, control warm starts, optional dual warm starts), same
`ILQRSolution` output, same acceptance / regularisation / convergence /
multiplier-update semantics as `ilqr.solve_impl` — but each inner
iteration's linearize + quadraticize + Riccati + line-search executes as
two pallas_calls per 128-scenario tile with the batch on the lanes.

Everything OUTSIDE the inner iteration reuses the existing jnp machinery
verbatim (terminal expansion by autodiff, `ocp.update_multipliers`,
`true_cost` / `max_violation`), on batch-leading views: those run once
per AL round / solve, ~1% of the round-4 measured wall, so their padded
layout does not matter.

Semantic deltas vs `ilqr.solve_impl`, both measured-equivalent:
  * curvature is ALWAYS the residual Gauss-Newton form (JtJ + active-set
    PHR) — `use_residual_gn=True`; round-1 measured residual-GN vs full-GN
    a wash on TPU with identical solutions (STATUS.md).
  * the previous iterate's cost is read off the alpha=0 line-search
    candidate (bitwise the incumbent re-rollout: accepted iterates are
    true rollouts, and frozen knots re-freeze deterministically) instead
    of being recomputed separately.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import SolverConfig
from aircraft_tpu.kernels.window_kernel import (
    LANES,
    UR,
    XR,
    make_backward_kernel,
    make_forward_kernel,
    make_window_spec,
)
from aircraft_tpu.solvers import ocp as ocp_mod
from aircraft_tpu.solvers.ilqr import ILQRSolution
from aircraft_tpu.solvers.ocp import ALState, OCPFunctions


def _to_tiles(x, rpad):
    """(B, *mid, r) batch-leading -> (T, *mid, rpad, LANES) batch-on-lanes."""
    B = x.shape[0]
    T = B // LANES
    y = x.reshape((T, LANES) + x.shape[1:])
    y = jnp.moveaxis(y, 1, -1)                     # (T, *mid, r, LANES)
    pad = rpad - y.shape[-2]
    if pad:
        widths = [(0, 0)] * (y.ndim - 2) + [(0, pad), (0, 0)]
        y = jnp.pad(y, widths)
    return y


def _to_tiles_fill(x, rpad, fill):
    """_to_tiles with a non-zero pad value (mu_row rows must pad to 1)."""
    B = x.shape[0]
    T = B // LANES
    y = x.reshape((T, LANES) + x.shape[1:])
    y = jnp.moveaxis(y, 1, -1)
    pad = rpad - y.shape[-2]
    if pad:
        widths = [(0, 0)] * (y.ndim - 2) + [(0, pad), (0, 0)]
        y = jnp.pad(y, widths, constant_values=fill)
    return y


def _from_tiles(y, r):
    """Inverse of _to_tiles: (T, *mid, rpad, LANES) -> (B, *mid, r)."""
    y = y[..., :r, :]
    y = jnp.moveaxis(y, -1, 1)                     # (T, LANES, *mid, r)
    return y.reshape((y.shape[0] * LANES,) + y.shape[2:])


def make_fused_solver(ocp: OCPFunctions, spec: dict, N: int,
                      config: SolverConfig, *, interpret: bool = False):
    """Build `solve(z0s (B, 14), us (B, N, 7), al_inits=None) ->
    ILQRSolution` with the inner iterations on the Pallas kernels.
    B must be a multiple of 128 (pad the scenario batch)."""
    ws, table = make_window_spec(spec, N)
    params = spec["params"]

    # identical alpha schedule to ilqr.solve_impl
    ls = config.line_search_steps
    alphas = tuple(
        float(a) for a in np.concatenate(
            [np.logspace(0.0, -(ls - 2), ls - 1, base=2.0), [0.0]]))
    A = len(alphas)

    backward = make_backward_kernel(ws, params, table,
                                    gain_clip=config.gain_clip,
                                    interpret=interpret)
    forward = make_forward_kernel(ws, params, table, alphas=alphas,
                                  interpret=interpret)
    restfac = np.asarray(ws.rest_factors, np.float32)[:, None]   # (N, 1)

    ks_idx = jnp.arange(N)

    def initial_rollout(z0, us):
        """ilqr.solve_impl's freeze-guarded warm-start rollout."""
        def body(x, inp):
            u, idx = inp
            x_next = ocp.step(x, u, idx)
            ok = jnp.all(jnp.isfinite(x_next)) & (
                jnp.max(jnp.abs(x_next)) < 1e6)
            x_next = jnp.where(ok, x_next, x)
            return x_next, x_next

        _, xs_tail = jax.lax.scan(body, z0, (us, ks_idx))
        return jnp.concatenate([z0[None], xs_tail], axis=0)

    def terminal_expansion(al, xT_b):
        """vmapped grad/hessian of the AL terminal cost (one knot — stays
        on the jnp path; negligible against the N-knot kernels)."""
        gfun = jax.grad(lambda a, x: ocp_mod.al_terminal_cost(ocp, a, x),
                        argnums=1)
        hfun = jax.hessian(lambda a, x: ocp_mod.al_terminal_cost(ocp, a, x),
                           argnums=1)
        vx = jax.vmap(gfun)(al, xT_b)          # (B, 14)
        vxx = jax.vmap(hfun)(al, xT_b)         # (B, 14, 14)
        san = lambda t: jnp.clip(
            jnp.nan_to_num(t, nan=0.0, posinf=0.0, neginf=0.0), -1e8, 1e8)
        return san(vx), san(vxx)

    def solve(z0s: jax.Array, us_init: jax.Array,
              al_inits: ALState = None) -> ILQRSolution:
        B = z0s.shape[0]
        pad = (-B) % LANES
        if pad:
            # pad the scenario batch to the lane tile by replicating the
            # last scenario — the chip is underutilised below one tile
            # anyway (this is what lets batch-1 serving and the 6-candidate
            # course windows ride the same kernels); outputs slice back
            rep = lambda t: jnp.concatenate(
                [t, jnp.broadcast_to(t[-1:], (pad,) + t.shape[1:])], axis=0)
            z0s = rep(z0s)
            us_init = rep(us_init)
            if al_inits is not None:
                al_inits = jax.tree.map(rep, al_inits)
        Bp = B + pad
        if al_inits is None:
            al = jax.vmap(
                lambda x, u: ocp_mod.init_al_state(
                    ocp, x, u, N, mu0=config.penalty_init)
            )(z0s, us_init[:, 0])
        else:
            al = al_inits

        xs_b = jax.vmap(initial_rollout)(z0s, us_init)   # (B, N+1, 14)
        xs_t = _to_tiles(xs_b, XR)
        ws_t = _to_tiles(us_init, UR)

        def al_round(carry, _):
            xs_t, ws_t, al, n_iters, grad_norm = carry
            lam_t = _to_tiles(al.lam_ineq, ws.ng_pad)      # (T, N, NG, L)
            murow_t = _to_tiles_fill(al.mu_row, ws.ng_pad, 1.0)  # (T, NG, L)
            mu_b = al.mu                                  # (B,)

            def inner(carry_i, _):
                xs_t, ws_t, reg, done, n_iters, grad_norm = carry_i
                xT_b = _from_tiles(xs_t[:, -1], 14)       # (B, 14)
                vx_b, vxx_b = terminal_expansion(al, xT_b)
                vxT_t = _to_tiles(vx_b, XR)
                vxxT_t = _to_tiles(
                    jnp.pad(vxx_b, ((0, 0), (0, XR - 14), (0, 0))), XR)
                scal_b = jnp.stack(
                    [mu_b, reg] + [jnp.zeros_like(reg)] * 6, axis=1)
                scal_t = _to_tiles(scal_b, 8)

                K_t, kff_t, misc_b = backward(
                    xs_t, ws_t, lam_t, scal_t, murow_t, vxT_t, vxxT_t,
                    restfac)
                xs_new_t, ws_new_t, misc_f = forward(
                    xs_t, ws_t, K_t, kff_t, lam_t, scal_t, murow_t,
                    restfac)

                fail = _from_tiles(misc_b, 4)[:, 3] > 0.5       # (B,)
                qu_max = _from_tiles(misc_b, 4)[:, 2]
                costs = _from_tiles(misc_f, A + 3)
                cost_prev = costs[:, A - 1]     # alpha = 0 — the incumbent
                cost_new = costs[:, A]
                improved = (cost_new < cost_prev - 1e-12) & ~fail

                reg_new = jnp.where(
                    fail | ~improved,
                    jnp.minimum(reg * config.reg_escalate, config.reg_max),
                    jnp.maximum(reg / config.reg_relax, config.reg_init),
                )
                accept = improved & ~done
                acc_t = _to_tiles(
                    accept.astype(jnp.float32)[:, None], 1)[:, 0]  # (T, L)
                m = acc_t[:, None, None, :]
                xs_t = jnp.where(m, xs_new_t, xs_t)
                ws_t = jnp.where(m, ws_new_t, ws_t)

                converged_now = (qu_max < config.tol) | (
                    improved
                    & (jnp.abs(cost_prev - cost_new)
                       < config.tol * (1.0 + jnp.abs(cost_prev))))
                done = done | (converged_now & ~fail)
                n_iters = n_iters + jnp.where(done, 0, 1)
                return (xs_t, ws_t, reg_new, done, n_iters, qu_max), None

            inner0 = (
                xs_t, ws_t,
                jnp.full((Bp,), config.reg_init, jnp.float32),
                jnp.zeros((Bp,), bool),
                n_iters,
                grad_norm,
            )
            (xs_t, ws_t, _, _, n_iters, grad_norm), _ = jax.lax.scan(
                inner, inner0, None, length=config.max_inner_iters)

            xs_b = _from_tiles(xs_t, 14)
            us_b = _from_tiles(ws_t, 7)
            al = jax.vmap(
                lambda a, x, u: ocp_mod.update_multipliers(
                    ocp, a, x, u, config.penalty_scale, config.penalty_max,
                    row_adapt=config.penalty_per_row,
                    row_scale=config.penalty_row_scale,
                    row_max=config.penalty_row_max,
                    row_target=config.penalty_row_target)
            )(al, xs_b, us_b)
            return (xs_t, ws_t, al, n_iters, grad_norm), None

        carry0 = (xs_t, ws_t, al, jnp.zeros((Bp,), jnp.int32),
                  jnp.full((Bp,), jnp.inf, jnp.float32))
        (xs_t, ws_t, al, n_iters, grad_norm), _ = jax.lax.scan(
            al_round, carry0, None, length=config.max_al_iters)

        xs_b = _from_tiles(xs_t, 14)
        us_b = _from_tiles(ws_t, 7)
        cost = jax.vmap(lambda x, u: ocp_mod.true_cost(ocp, x, u))(xs_b, us_b)
        viol = jax.vmap(lambda x, u: ocp_mod.max_violation(ocp, x, u))(
            xs_b, us_b)
        converged = (viol < config.constraint_tol) & jnp.isfinite(cost)
        sol = ILQRSolution(
            xs=xs_b, us=us_b, cost=cost, violation=viol,
            converged=converged, iterations=n_iters, grad_norm=grad_norm,
            al=al,
        )
        if pad:
            sol = jax.tree.map(lambda t: t[:B], sol)
        return sol

    return solve
