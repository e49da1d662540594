"""Parity tests for the fused batch-lanes window kernels
(kernels/window_kernel.py + solvers/fused.py) against the jnp solver path
on the IDENTICAL problem instance, in Pallas interpret mode on CPU.

The oracle is the existing machinery: `ilqr._quadraticize_gn`
(residual form) + `riccati.backward_sequential` for the backward kernel,
`ilqr._forward_pass` for the forward kernel, and `ilqr.solve_batch` for
the full fused solve.  Tolerances are loose-ish (1e-2 relative on gains)
because the kernel computes arctan/arcsin with the rollout kernel's
minimax polynomials (|err| ~ 2e-8) whose derivative differences propagate
through N knots of Riccati conditioning — bit parity is not the contract,
matching solver behaviour is.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aircraft_tpu.config import SolverConfig, glider_config
from aircraft_tpu.control.course import COURSE_OCP_KNOBS, course_track
from aircraft_tpu.control.mhtt import build_mhtt_ocp
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.dynamics.coefficients import default_nn_coeff
from aircraft_tpu.solvers import ilqr, riccati
from aircraft_tpu.solvers import ocp as ocp_mod
from aircraft_tpu.solvers.fused import (
    _from_tiles,
    _to_tiles,
    _to_tiles_fill,
    make_fused_solver,
)
from aircraft_tpu.kernels.window_kernel import (
    NG,
    UR,
    XR,
    make_backward_kernel,
    make_window_spec,
)

N = 4
B = 128  # one lane tile — the kernel minimum


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_memory():
    """The interpret-mode kernels compile very large XLA:CPU programs; at
    the tail of a full-suite process the accumulated executables exhaust
    LLVM code-section memory and abort the interpreter (the same limit
    that forces the ablation grid to shard by subprocess).  Dropping the
    compilation caches before this module frees the prior ~195 tests'
    executables."""
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def problem():
    cfg = glider_config()
    coeff = default_nn_coeff()
    params = AircraftParams.from_config(cfg.aircraft, coeff=coeff)
    track = course_track(cfg, v_ref=30.0, glide_ld=8.5)
    z_end = float(np.asarray(track.track_points)[:, 2].max())
    track.track_points = track.track_points.at[:, 2].add(-(z_end + 20.0))

    knobs = dict(COURSE_OCP_KNOBS)
    knobs["envelope_overrides"] = {
        **(knobs.get("envelope_overrides") or {}), "unit_scales": True}
    knobs["squash_box"] = True
    spec = {}
    ocp = build_mhtt_ocp(params, cfg, track.track_points, track.length(),
                         dt=0.01, v_ref=30.0, spec_out=spec, **knobs)

    x0 = jnp.asarray(cfg.waypoints.initial_state, jnp.float32)
    key = jax.random.PRNGKey(0)
    z0s = jnp.concatenate([
        jnp.tile(x0[None], (B, 1)) + 0.01 * jax.random.normal(key, (B, 13)),
        jnp.linspace(0.1, 0.3, B)[:, None].astype(jnp.float32),
    ], axis=1)
    ws = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (B, N, 7))

    def roll(z0, us):
        def body(x, inp):
            u, k = inp
            xn = ocp.step(x, u, k)
            return xn, xn

        _, xs = jax.lax.scan(body, z0, (us, jnp.arange(N)))
        return jnp.concatenate([z0[None], xs], axis=0)

    xs = jax.vmap(roll)(z0s, ws)
    assert bool(jnp.isfinite(xs).all())
    al = jax.vmap(
        lambda x, u: ocp_mod.init_al_state(ocp, x, u, N, mu0=10.0)
    )(z0s, ws[:, 0])
    # one multiplier update so the PHR active-set terms are non-trivial
    al = jax.vmap(
        lambda a, x, u: ocp_mod.update_multipliers(ocp, a, x, u, 10.0, 1e8)
    )(al, xs, ws)
    return dict(cfg=cfg, params=params, spec=spec, ocp=ocp,
                z0s=z0s, ws=ws, xs=xs, al=al)


@pytest.mark.slow
def test_backward_kernel_matches_jnp_path(problem):
    ocp, spec, params = problem["ocp"], problem["spec"], problem["params"]
    xs, ws, al = problem["xs"], problem["ws"], problem["al"]
    reg = jnp.full((B,), 1e-6, jnp.float32)

    def ref_one(xs_i, ws_i, al_i, reg_i):
        lx, lu, lxx, luu, lux, vx, vxx = ilqr._quadraticize_gn(
            ocp, al_i, xs_i, ws_i, use_residuals=True)
        san = lambda t: jnp.clip(
            jnp.nan_to_num(t, nan=0.0, posinf=0.0, neginf=0.0), -1e8, 1e8)
        lx, lu, lxx, luu, lux, vx, vxx = map(
            san, (lx, lu, lxx, luu, lux, vx, vxx))

        def jac(x, u, idx):
            A = jax.jacfwd(lambda xx: ocp.step(xx, u, idx))(x)
            Bm = jax.jacfwd(lambda uu: ocp.step(x, uu, idx))(u)
            return A, Bm

        A, Bm = jax.vmap(jac)(xs_i[:-1], ws_i, jnp.arange(N))
        clean = lambda t: jnp.clip(
            jnp.nan_to_num(t, nan=0.0, posinf=0.0, neginf=0.0), -1e6, 1e6)
        K, kff, dv1, dv2, qu, fail = riccati.backward_sequential(
            clean(A), clean(Bm), lx, lu, lxx, luu, lux, vx, vxx, reg_i)
        return K, kff, qu

    with jax.default_matmul_precision("highest"):
        K_ref, k_ref, qu_ref = jax.jit(jax.vmap(ref_one))(xs, ws, al, reg)

        wspec, table = make_window_spec(spec, N)
        backward = make_backward_kernel(wspec, params, table,
                                        gain_clip=1e4, interpret=True)
        restfac = np.asarray(wspec.rest_factors, np.float32)[:, None]
        xs_t, ws_t = _to_tiles(xs, XR), _to_tiles(ws, UR)
        lam_t = _to_tiles(al.lam_ineq, NG)
        murow_t = _to_tiles_fill(al.mu_row, NG, 1.0)
        scal_t = _to_tiles(
            jnp.stack([al.mu, reg] + [jnp.zeros_like(reg)] * 6, axis=1), 8)
        gfun = jax.grad(
            lambda a, x: ocp_mod.al_terminal_cost(ocp, a, x), argnums=1)
        hfun = jax.hessian(
            lambda a, x: ocp_mod.al_terminal_cost(ocp, a, x), argnums=1)
        vx_b = jax.vmap(gfun)(al, xs[:, -1])
        vxx_b = jax.vmap(hfun)(al, xs[:, -1])
        vxT_t = _to_tiles(vx_b, XR)
        vxxT_t = _to_tiles(jnp.pad(vxx_b, ((0, 0), (0, XR - 14), (0, 0))), XR)
        K_t, kff_t, misc = backward(xs_t, ws_t, lam_t, scal_t, murow_t,
                                    vxT_t, vxxT_t, restfac)

    K_k = _from_tiles(K_t, 14)[:, :, :7, :]
    k_k = _from_tiles(kff_t, UR)[:, :, :7]
    qu_k = _from_tiles(misc, 4)[:, 2]

    scale = 1.0 + float(jnp.max(jnp.abs(K_ref)))
    assert float(jnp.max(jnp.abs(K_k - K_ref))) / scale < 1e-2
    kscale = 1.0 + float(jnp.max(jnp.abs(k_ref)))
    assert float(jnp.max(jnp.abs(k_k - k_ref))) / kscale < 1e-2
    assert float(jnp.max(jnp.abs(qu_k - qu_ref) / (1.0 + qu_ref))) < 1e-2


@pytest.mark.slow
def test_fused_solve_tracks_jnp_solve(problem):
    """Full fused solve vs ilqr.solve_batch at the same (small) budget:
    same convergence behaviour in aggregate — per-scenario bit parity is
    not expected (minimax atan + summation order through a chaotic plant),
    but the solved populations must match in cost and feasibility."""
    ocp, spec = problem["ocp"], problem["spec"]
    z0s = problem["z0s"]
    us = jnp.zeros((B, N, 7), jnp.float32)
    config = SolverConfig(max_al_iters=1, max_inner_iters=2,
                          line_search_steps=4, hessian="gauss_newton",
                          reg_escalate=100.0, use_residual_gn=True)
    with jax.default_matmul_precision("highest"):
        solve_fused = make_fused_solver(ocp, spec, N, config, interpret=True)
        sol_f = solve_fused(z0s, us)
        sol_x = ilqr.solve_batch(ocp, z0s, us, config)

    assert bool(jnp.isfinite(sol_f.cost).all())
    cf = float(jnp.nanmean(sol_f.cost))
    cx = float(jnp.nanmean(sol_x.cost))
    assert abs(cf - cx) / (1.0 + abs(cx)) < 0.05, (cf, cx)
    vf = float(jnp.nanmean(sol_f.violation))
    vx = float(jnp.nanmean(sol_x.violation))
    assert abs(vf - vx) < 0.3 * (1.0 + vx), (vf, vx)
    # the AL state advanced identically in structure
    assert sol_f.al.lam_ineq.shape == sol_x.al.lam_ineq.shape
