"""Riccati backward sweeps: sequential scan and parallel-in-time
associative scan.

The horizon is this domain's "sequence axis" (SURVEY §5.7): the reference
scales it by windowing because its solve is inherently serial; on TPU the
LQR backward pass itself parallelises.  Each knot contributes a
conditional-value-function element and the combination of such elements is
associative, so `jax.lax.associative_scan` reduces the whole horizon in
O(log N) depth instead of O(N) — the classical temporal-parallelisation
result for LQT (Särkkä & García-Fernández, "Temporal Parallelization of
Bayesian Smoothers"), applied here to the iLQR inner step.

Cross terms (l_ux) are removed up front by the standard substitution
ū = u + L x with L = l_uu⁻¹ l_ux, which shifts A ← A − B L and
l_xx ← l_xx − l_uxᵀ L; linear cost terms ride the affine element slots.

Both sweeps return identical gains (tests/test_riccati.py); pick
`riccati='associative'` for long horizons (N ≳ 128) where the log-depth
critical path wins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _chol_solve_base(M, rhs, reg):
    """Positive-definite solve: plain Cholesky with the iteration's
    regulariser first; if that fails (exact AL curvature of complementarity
    terms can be indefinite), retry with a Gershgorin shift — enough that
    every disc is positive, PD-guaranteed without an eigendecomposition.
    The fallback keeps the sweep productive instead of flagging the whole
    iteration; Gershgorin is NOT applied to healthy knots (it is
    conservative and would over-damp the Newton step)."""
    m = M.shape[-1]
    eye = jnp.eye(m, dtype=M.dtype)
    M = 0.5 * (M + jnp.swapaxes(M, -1, -2))
    L0 = jnp.linalg.cholesky(M + reg * eye)
    bad0 = jnp.any(jnp.isnan(L0))
    diag = jnp.diagonal(M, axis1=-2, axis2=-1)
    off = jnp.sum(jnp.abs(M), axis=-1) - jnp.abs(diag)
    gersh = jnp.maximum(0.0, -jnp.min(diag - off, axis=-1) + 1e-6)
    L1 = jnp.linalg.cholesky(M + (reg + gersh)[..., None, None] * eye)
    L = jnp.where(bad0, L1, L0)
    bad = jnp.any(jnp.isnan(L))
    L = jnp.where(bad, eye, L)
    return jax.scipy.linalg.cho_solve((L, True), rhs), bad


# ---------------------------------------------------------------------------
# batched PD solve with a Pallas fast path
#
# Under `vmap(solve)` every per-knot Quu solve becomes a batch of tiny SPD
# systems — exactly the shape the lanes-layout Pallas kernel
# (kernels/cholesky_kernel.py, 1.31x over XLA on v5e) was built for.  A
# `custom_vmap` routes the BATCHED call to the kernel on TPU while the
# unbatched call keeps the reference implementation; a `lax.cond` full-batch
# fallback preserves the Gershgorin-retry semantics when any instance in
# the batch is too indefinite for plain Cholesky (GN-mode curvature is PSD
# by construction, so the fallback almost never fires).
# ---------------------------------------------------------------------------

_PALLAS_CHOL = False       # flipped by enable_pallas_chol()
_PALLAS_INTERPRET = False  # CPU interpret-mode escape for tests


def enable_pallas_chol(on: bool = True, *, interpret: bool = False) -> None:
    """Toggle the Pallas batched-Cholesky fast path (TPU only; pass
    ``interpret=True`` to exercise it on CPU in Pallas interpret mode for
    tests).  Module state rather than a config field because the solve
    functions are traced through `custom_vmap`, whose rules cannot thread
    solver config."""
    global _PALLAS_CHOL, _PALLAS_INTERPRET
    _PALLAS_CHOL = on
    _PALLAS_INTERPRET = interpret


from jax import custom_batching as _cb


@_cb.custom_vmap
def _chol_solve(M, rhs, reg):
    return _chol_solve_base(M, rhs, reg)


@_chol_solve.def_vmap
def _chol_solve_vmap(axis_size, in_batched, M, rhs, reg):
    M_b, rhs_b, reg_b = in_batched
    # broadcast unbatched operands to the batch
    if not M_b:
        M = jnp.broadcast_to(M, (axis_size,) + M.shape)
    if not rhs_b:
        rhs = jnp.broadcast_to(rhs, (axis_size,) + rhs.shape)
    reg_vec = reg if reg_b else jnp.broadcast_to(reg, (axis_size,))

    def xla_path():
        return jax.vmap(_chol_solve_base)(M, rhs, reg_vec)

    use_kernel = (
        _PALLAS_CHOL
        and (jax.default_backend() == "tpu" or _PALLAS_INTERPRET)
        and M.ndim == 3
        and M.shape[-1] <= 16
    )
    if not use_kernel:
        return xla_path(), (True, True)

    from aircraft_tpu.kernels.cholesky_kernel import LANES, make_batched_cholesky_solve

    m = M.shape[-1]
    k = rhs.shape[-1]
    Bsz = M.shape[0]
    pad = (-Bsz) % LANES
    eye = jnp.eye(m, dtype=M.dtype)
    M_sym = 0.5 * (M + jnp.swapaxes(M, -1, -2)) + reg_vec[:, None, None] * eye
    M_p = jnp.concatenate(
        [M_sym, jnp.broadcast_to(eye, (pad, m, m))], axis=0
    ) if pad else M_sym
    rhs_p = jnp.concatenate(
        [rhs, jnp.zeros((pad, m, k), rhs.dtype)], axis=0
    ) if pad else rhs

    kernel = make_batched_cholesky_solve(m, k, interpret=_PALLAS_INTERPRET)
    X = kernel(M_p, rhs_p)[:Bsz]
    ok = jnp.all(jnp.isfinite(X))

    def fast(_):
        return X, jnp.zeros((Bsz,), bool)

    Xf, bad = jax.lax.cond(ok, fast, lambda _: xla_path(), None)
    return (Xf, bad), (True, True)


def backward_sequential(A, B, lx, lu, lxx, luu, lux, vx, vxx, reg,
                        unroll: int = 1):
    """Classic O(N) Riccati recursion (used by ilqr._backward_pass; kept
    here as the reference implementation for the parallel variant)."""

    def step(carry, inp):
        Vx, Vxx, fail = carry
        A_k, B_k, lx_k, lu_k, lxx_k, luu_k, lux_k = inp
        Qx = lx_k + A_k.T @ Vx
        Qu = lu_k + B_k.T @ Vx
        Qxx = lxx_k + A_k.T @ Vxx @ A_k
        Quu = luu_k + B_k.T @ Vxx @ B_k
        Qux = lux_k + B_k.T @ Vxx @ A_k
        sol, bad = _chol_solve(Quu, jnp.concatenate([Qu[:, None], Qux], axis=1), reg)
        k_k, K_k = -sol[:, 0], -sol[:, 1:]
        Vx_new = Qx + K_k.T @ Quu @ k_k + K_k.T @ Qu + Qux.T @ k_k
        Vxx_new = Qxx + K_k.T @ Quu @ K_k + K_k.T @ Qux + Qux.T @ K_k
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        # value-function clamp: diverged linearisation points (frozen knots
        # with ~1e6 sensitivities) would otherwise amplify Vxx past float32
        # range within a few knots and NaN the whole sweep
        lim = 1e14  # far above legitimate AL curvature (~1e8), far below f32 overflow
        Vx_new = jnp.clip(jnp.nan_to_num(Vx_new, nan=0.0, posinf=lim, neginf=-lim), -lim, lim)
        Vxx_new = jnp.clip(jnp.nan_to_num(Vxx_new, nan=0.0, posinf=lim, neginf=-lim), -lim, lim)
        dv1 = k_k @ Qu
        dv2 = 0.5 * k_k @ Quu @ k_k
        return (Vx_new, Vxx_new, fail | bad), (K_k, k_k, dv1, dv2, jnp.max(jnp.abs(Qu)))

    (_, _, fail), (K, k, dv1, dv2, qu) = jax.lax.scan(
        step, (vx, vxx, jnp.asarray(False)), (A, B, lx, lu, lxx, luu, lux),
        reverse=True, unroll=unroll,
    )
    return K, k, jnp.sum(dv1), jnp.sum(dv2), jnp.max(qu), fail


def cv_elements(A, B, lx, lu, lxx, luu, lux, reg):
    """Per-knot conditional-value elements (A_e, b_e, C_e, η_e, J_e) for the
    associative Riccati reduction.  Returns (stage elements, fail flag).
    Cross terms are removed by ū = u + L x, L = luu⁻¹ lux (module
    docstring)."""
    m = B.shape[2]
    dtype = A.dtype
    eye_m = jnp.eye(m, dtype=dtype)

    luu_r = 0.5 * (luu + jnp.swapaxes(luu, -1, -2)) + reg * eye_m
    chol = jnp.linalg.cholesky(luu_r)
    fail = jnp.any(jnp.isnan(chol))
    chol = jnp.where(fail, jnp.eye(m, dtype=dtype), chol)
    Lmat = jax.vmap(lambda c, M: jax.scipy.linalg.cho_solve((c, True), M))(chol, lux)
    lu_bar = jax.vmap(lambda c, v: jax.scipy.linalg.cho_solve((c, True), v))(chol, lu)

    A_bar = A - jnp.einsum("kij,kjl->kil", B, Lmat)
    lxx_bar = lxx - jnp.einsum("kji,kjl->kil", lux, Lmat)
    lx_bar = lx - jnp.einsum("kji,kj->ki", lux, lu_bar)

    Rinv = jax.vmap(lambda c: jax.scipy.linalg.cho_solve((c, True), eye_m))(chol)
    C_e = jnp.einsum("kij,kjl,kml->kim", B, Rinv, B)
    b_e = -jnp.einsum("kij,kjl,kl->ki", B, Rinv, lu)

    return (A_bar, b_e, C_e, -lx_bar, lxx_bar), fail


def cv_terminal(vx, vxx):
    """Terminal boundary element (appended past the last stage)."""
    n = vx.shape[-1]
    dtype = vx.dtype
    return (jnp.zeros((n, n), dtype), jnp.zeros((n,), dtype),
            jnp.zeros((n, n), dtype), -vx, vxx)


def cv_identity(n, dtype):
    """Identity of the combine: combine(e_id, x) == combine(x, e_id) == x
    (A = I, everything else zero — verified in tests/test_riccati.py)."""
    return (jnp.eye(n, dtype=dtype), jnp.zeros((n,), dtype),
            jnp.zeros((n, n), dtype), jnp.zeros((n,), dtype),
            jnp.zeros((n, n), dtype))


def cv_combine(e_late, e_early):
    """Associative combination rule, G = (I + C1 J2)⁻¹:
        A = A2 G A1
        b = A2 G (b1 + C1 η2) + b2
        C = A2 G C1 A2ᵀ + C2
        η = A1ᵀ Gᵀ (η2 − J2 b1) + η1
        J = A1ᵀ Gᵀ J2 A1 + J1
    Under reverse=True, associative_scan feeds the HIGHER-index block as the
    first argument (empirically: scan[0] = f(e_N, ... f(e_1, e_0)))."""
    A1, b1, C1, eta1, J1 = e_early
    A2, b2, C2, eta2, J2 = e_late
    n_ = A1.shape[-1]
    I = jnp.eye(n_, dtype=A1.dtype)
    G = jnp.linalg.solve(I + jnp.einsum("...ij,...jk->...ik", C1, J2), I)
    # (I + J2 C1)^{-1} = G^T for symmetric C1, J2
    GT = jnp.swapaxes(G, -1, -2)
    A2G = jnp.einsum("...ij,...jk->...ik", A2, G)
    A_new = jnp.einsum("...ij,...jk->...ik", A2G, A1)
    b_new = jnp.einsum("...ij,...j->...i", A2G,
                       b1 + jnp.einsum("...ij,...j->...i", C1, eta2)) + b2
    C_new = jnp.einsum("...ij,...jk,...lk->...il", A2G, C1, A2) + C2
    A1T_GT = jnp.einsum("...ji,...jk->...ik", A1, GT)
    eta_new = jnp.einsum("...ij,...j->...i", A1T_GT,
                         eta2 - jnp.einsum("...ij,...j->...i", J2, b1)) + eta1
    J_new = jnp.einsum("...ij,...jk,...kl->...il", A1T_GT, J2, A1) + J1
    J_new = 0.5 * (J_new + jnp.swapaxes(J_new, -1, -2))
    return (A_new, b_new, C_new, eta_new, J_new)


def recover_gains(A, B, lu, luu, lux, Vx_next, Vxx_next, reg):
    """Per-knot feedback/feedforward gains from the scanned V_{k+1}."""

    def gains(A_k, B_k, lu_k, luu_k, lux_k, Vx1, Vxx1):
        Qu = lu_k + B_k.T @ Vx1
        Quu = luu_k + B_k.T @ Vxx1 @ B_k
        Qux = lux_k + B_k.T @ Vxx1 @ A_k
        sol, bad = _chol_solve(Quu, jnp.concatenate([Qu[:, None], Qux], axis=1), reg)
        K_k, k_k = -sol[:, 1:], -sol[:, 0]
        dv1 = k_k @ Qu
        dv2 = 0.5 * k_k @ Quu @ k_k
        return K_k, k_k, dv1, dv2, jnp.max(jnp.abs(Qu)), bad

    return jax.vmap(gains)(A, B, lu, luu, lux, Vx_next, Vxx_next)


def backward_associative(A, B, lx, lu, lxx, luu, lux, vx, vxx, reg):
    """O(log N)-depth Riccati via associative scan over conditional-value
    elements (see `cv_elements`/`cv_combine`).  Gains are recovered per-knot
    from the scanned V_{k+1} in one vmap."""
    stage, fail = cv_elements(A, B, lx, lu, lxx, luu, lux, reg)
    term = cv_terminal(vx, vxx)
    elems = jax.tree_util.tree_map(
        lambda s, t: jnp.concatenate([s, t[None]], axis=0), stage, term)

    scanned = jax.lax.associative_scan(cv_combine, elems, reverse=True, axis=0)
    # V_k params for k = 0..N (scanned[k] combines stages k..N)
    eta_all, J_all = scanned[3], scanned[4]
    Vx_next, Vxx_next = -eta_all[1:], J_all[1:]     # V_{k+1} for k = 0..N-1

    K, k, dv1, dv2, qu, bads = recover_gains(
        A, B, lu, luu, lux, Vx_next, Vxx_next, reg)
    return K, k, jnp.sum(dv1), jnp.sum(dv2), jnp.max(qu), fail | jnp.any(bads)
