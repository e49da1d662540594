"""Pallas TPU kernels: the fused batch-major inner iLQR iteration of the
N=50 MHTT window solve — the round-4 roofline finding made executable.

Why this kernel exists (measured, STATUS round 4): 97% of the headline
solve's wall is the inner iterations; each iteration runs at 0.008% of MXU
peak / 2.6% of HBM bandwidth because, with the scenario batch leading,
every (B, 13, 13)-class intermediate pads its 13-wide minor dim to the
128-lane tile (~9x HBM traffic and lane waste), and neither logical
batch-minor vmap (a wash — XLA drops the layout request) nor per-phase
kernels (dispatch-bound) can claim the padding back.  These kernels lay
the batch ON the lanes explicitly — every per-knot tensor is (rows, B)
with B = 128·tiles — and fuse one whole inner iteration into two
pallas_calls per tile:

  * backward kernel — for k = N-1..0 ON THE FLY: linearize the augmented
    step (RK4 + MLP surrogate + progress channel), Gauss-Newton
    quadraticize the AL stage cost (residual JtJ + active-set PHR
    constraint curvature), and run the Riccati recursion with an unrolled
    per-lane 7x7 Cholesky — nothing per-knot ever round-trips HBM.
  * forward kernel — all line-search candidates rolled out sequentially
    (costs only), per-lane best-alpha selection, then one final rollout
    storing the chosen trajectory.

Derivatives are NOT hand-written: the per-knot function is traced with
`jax.linearize` INSIDE the kernel and evaluated on the 21 basis tangents
via `jax.vmap` — trace-level AD, so the kernel's math is derived from the
same row-level physics the (parity-tested) fused rollout kernel uses
(kernels/rollout_kernel._derivative_core), and the formulation constants
come from the SAME resolved spec `build_mhtt_ocp` fills (control/mhtt.py
spec_out) — kernel and jnp path cannot silently diverge on knob defaults.

Reference analogue: the nlp_hess_l hotspot — 55.7 ms per Hessian
evaluation was the reference's dominant cost (reference todo.md block 1,
SURVEY §6); this kernel computes the same curvature information for 128
scenarios per tile in VMEM.

Track lookups (Catmull-Rom eval/tangent, per-lane segment index) use a
one-hot matmul against four pre-shifted control-point tables — TPU has no
per-lane gather, but an (M, B) one-hot against an (M, 12) table is a tiny
MXU contraction.

Parity oracle: tests/test_window_kernel.py runs these kernels in Pallas
interpret mode on CPU against solvers/ilqr's linearize + _quadraticize_gn
(residual form) + backward_sequential + _forward_pass on the identical
problem instance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.control.mhtt import (
    W_BACKWARD,
    W_CONTROL,
    W_LOW_VELOCITY,
    W_PROGRESS,
    W_PROGRESS_RATE,
    W_TERMINAL_ALIGN,
    W_TRACKING,
)
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.dynamics.coefficients import MLPCoeffParams
from aircraft_tpu.kernels.rollout_kernel import (
    _build_constants,
    _rk4_norm,
    fold_mlp_constants,
    kernel_coeff_supported,
    make_default_coeff,
    make_smem_mlp,
    wrap_mlp_coeff,
)

LANES = 128
XR = 16   # 14 augmented state rows [x(13), s] padded to two sublane tiles
UR = 8    # 7 control rows padded
NG = 8    # 7 envelope inequality rows padded (24 when AL box rows are on)
NDIR = 14 + 7  # linearization basis: 14 state + 7 control directions

FREEZE_PENALTY = 1e7  # mirror of solvers/ilqr.FREEZE_PENALTY


class WindowSpec(NamedTuple):
    """Static formulation constants resolved from build_mhtt_ocp's
    spec_out dict (everything here is a python literal or host numpy —
    trace-time constants for the kernels)."""

    N: int
    dt: float
    substeps: int
    L: float
    progress_correction: float
    dim_mask: tuple          # (3,) 0/1
    v_ref: float
    w_speed: float
    w_rate: float
    alpha_guard: float       # radians, 0 = off
    beta_guard: float        # radians, 0 = off
    stall_margin: float
    stall_factor: float
    # envelope rows
    speed_lo2: float
    speed_hi2: float
    lo_scale: float
    hi_scale: float
    alpha_lim: float
    beta_lim: float
    # control squash (None = physical controls)
    squash_mid: tuple | None
    squash_half: tuple | None
    # AL control-box rows (the no-squash formulation, e.g. the course
    # recipe): g = [u - ub, lb - u] prepended to the envelope rows
    include_box: bool
    box_lb: tuple | None
    box_ub: tuple | None
    ng_pad: int
    # per-knot progress-reward damping factors (N,)
    rest_factors: tuple
    # track tables
    M: int                   # number of track points


def make_window_spec(spec: dict, N: int) -> tuple[WindowSpec, np.ndarray]:
    """Resolve build_mhtt_ocp's spec_out dict into kernel constants plus
    the pre-shifted Catmull-Rom point table (M, 12) [P0|P1|P2|P3]."""
    assert not spec.get("wind_channels"), "fused kernel: wind channels TBD"
    env = spec["envelope"]
    include_box = bool(env["include_control_box"])
    pts = np.asarray(spec["track_points"], np.float32)
    M = pts.shape[0]
    idx = np.arange(M)
    table = np.concatenate(
        [pts[np.clip(idx - 1, 0, M - 1)], pts[idx],
         pts[np.clip(idx + 1, 0, M - 1)], pts[np.clip(idx + 2, 0, M - 1)]],
        axis=1).astype(np.float32)          # (M, 12)

    dim_mask = tuple(1.0 if d in spec["track_dims"] else 0.0
                     for d in range(3))
    tail = spec.get("tail_damp")
    rest_factors = tuple(
        (tail[1] if (tail is not None and k >= tail[0]) else 1.0)
        for k in range(N))
    if spec["squash_box"]:
        lb, ub = spec["squash_bounds"]
        lb = np.asarray(lb, np.float32)
        ub = np.asarray(ub, np.float32)
        mid = tuple(float(v) for v in 0.5 * (lb + ub))
        half = tuple(float(v) for v in 0.5 * (ub - lb))
    else:
        mid = half = None
    ws = WindowSpec(
        N=N, dt=float(spec["dt"]), substeps=int(spec["substeps"]),
        L=float(spec["track_length"]),
        progress_correction=float(spec["progress_correction"]),
        dim_mask=dim_mask,
        v_ref=float(spec["v_ref"]), w_speed=float(spec["w_speed"]),
        w_rate=float(spec["w_rate"]),
        alpha_guard=float(np.deg2rad(spec["alpha_guard_deg"])),
        beta_guard=float(np.deg2rad(spec["beta_guard_deg"])),
        stall_margin=float(spec["stall_guard"][0]),
        stall_factor=float(spec["stall_guard"][1]),
        speed_lo2=float(env["speed_bounds"][0] ** 2),
        speed_hi2=float(env["speed_bounds"][1] ** 2),
        lo_scale=float(env["lo_scale"]), hi_scale=float(env["hi_scale"]),
        alpha_lim=float(env["alpha_lim"]), beta_lim=float(env["beta_lim"]),
        squash_mid=mid, squash_half=half,
        include_box=include_box,
        box_lb=(tuple(float(v) for v in env["lb"]) if include_box else None),
        box_ub=(tuple(float(v) for v in env["ub"]) if include_box else None),
        ng_pad=(24 if include_box else 8),
        rest_factors=rest_factors,
        M=M,
    )
    return ws, table


def n_ineq_rows(ws: WindowSpec) -> int:
    """Real (unpadded) stage-inequality rows, matching envelope_ineq's
    row order: [box upper(7), box lower(7)] (when on) + 7 envelope rows."""
    return (14 if ws.include_box else 0) + 7


def n_residual_rows(ws: WindowSpec) -> int:
    nr = 3 + 1 + 1 + 7 + 1          # tracking, backward, low-v, control, overspeed
    if ws.w_speed > 0.0:
        nr += 2                      # speed hold + stall guard
    if ws.w_rate > 0.0:
        nr += 3                      # body rates
    if ws.alpha_guard > 0.0:
        nr += 1
    if ws.beta_guard > 0.0:
        nr += 1
    return nr


# ---------------------------------------------------------------------------
# in-kernel math helpers (rows x lanes layout; all python loops unroll at
# trace time into elementwise VPU ops)
# ---------------------------------------------------------------------------


def _take1(X, j, axis):
    """X[..., j, ...] KEEPING the axis — explicit slice_in_dim: the
    jnp fancy-index form `X[:, j, None, :]` (int mixed with None) lowers
    to a >2D gather, which Mosaic rejects."""
    return jax.lax.slice_in_dim(X, j, j + 1, axis=axis)


def _mv(Mt, v):
    """out[a] = sum_b Mt[a, b] * v[b] for Mt (a, b, B), v (b, B)."""
    return jnp.sum(Mt * v[None, :, :], axis=1)


def _mm(X, Y):
    """out[a, c] = sum_b X[a, b] * Y[b, c]; X (a,b,B), Y (b,c,B).
    Unrolled accumulation — no (a,b,c,B) transient."""
    b_dim = X.shape[1]
    acc = _take1(X, 0, 1) * _take1(Y, 0, 0)
    for b in range(1, b_dim):
        acc = acc + _take1(X, b, 1) * _take1(Y, b, 0)
    return acc


def _mmT(X, YT):
    """out[a, c] = sum_b X[a, b] * YT[c, b]; X (a,b,B), YT (c,b,B)."""
    b_dim = X.shape[1]
    acc = _take1(X, 0, 1) * jnp.swapaxes(_take1(YT, 0, 1), 0, 1)
    for b in range(1, b_dim):
        acc = acc + _take1(X, b, 1) * jnp.swapaxes(_take1(YT, b, 1), 0, 1)
    return acc


def _pad_rows(t, rows):
    """Zero-pad the leading axis of t (r, ..., B) to `rows` (no in-kernel
    scatter: concatenate lowers cleanly in Mosaic)."""
    pad = rows - t.shape[0]
    if pad == 0:
        return t
    return jnp.concatenate(
        [t, jnp.zeros((pad,) + t.shape[1:], t.dtype)], axis=0)


def _chol_solve_lanes(a_rows, rhs_rows, m: int, k: int):
    """Unrolled per-lane Cholesky factor+solve (kernels/cholesky_kernel
    pattern) that ALSO reports per-lane indefiniteness: a pivot driven
    below -1e-6 means the (regularised) Quu was not PD and the produced
    gains are garbage — the caller escalates reg, exactly the jnp path's
    `_chol_solve` bad flag."""
    L = [[None] * m for _ in range(m)]
    bad = None
    for i in range(m):
        for j in range(i + 1):
            s = a_rows[i][j]
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            if i == j:
                flag = s < -1e-6
                bad = flag if bad is None else (bad | flag)
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]

    out = []
    for col in range(k):
        y = [None] * m
        for i in range(m):
            s = rhs_rows[i][col]
            for p in range(i):
                s = s - L[i][p] * y[p]
            y[i] = s / L[i][i]
        x = [None] * m
        for i in reversed(range(m)):
            s = y[i]
            for p in range(i + 1, m):
                s = s - L[p][i] * x[p]
            x[i] = s / L[i][i]
        out.append(x)
    return out, bad  # out[col][row] (B,)


def _sanitize(t, lim):
    t = jnp.where(jnp.isfinite(t), t, 0.0)
    return jnp.clip(t, -lim, lim)


# ---------------------------------------------------------------------------
# the per-knot formulation (rows layout) — primal and outputs for linearize
# ---------------------------------------------------------------------------


def _make_knot_fns(ws: WindowSpec, C: dict, mlp, table_vals):
    """Build the per-knot functions over (x (XR,B), w (UR,B)) in rows
    layout.  `table_vals` is the PRE-TRANSPOSED (12, M) shifted-point table
    already read from VMEM.  Returns (knot_outputs, al_stage_cost_rows, step_only):

      knot_outputs(x, w, rf) -> (x_next (XR,B), r (NR,B), g (NG,B), rest (1,B))
      al_cost(x, w, rf, lam_k, mu, mu_row) -> (B,) AL stage cost
      (both share one traced primal pipeline)
    """
    Mpts = ws.M
    dt = ws.dt
    dt_sub = ws.dt / ws.substeps
    dm = ws.dim_mask
    Linv = 1.0 / ws.L

    def squash(w):
        if ws.squash_mid is None:
            return w
        rows = []
        for c in range(7):
            half = ws.squash_half[c]
            if half == 0.0:
                rows.append(jnp.zeros_like(w[c]) + ws.squash_mid[c])
            else:
                rows.append(ws.squash_mid[c] + half * jnp.tanh(w[c]))
        rows.append(jnp.zeros_like(w[0]))
        return jnp.stack(rows)

    def track_lookup(s):
        """Catmull-Rom eval + tangent at s (B,) via one-hot matmul against
        the pre-shifted table (control/initialisation.py:35-79 semantics,
        including the [0, 1] clip)."""
        u = jnp.clip(s, 0.0, 1.0) * (Mpts - 1)
        i = jnp.clip(jnp.floor(u), 0.0, Mpts - 2.0)
        t = u - i
        # integer iota (Mosaic tpu.iota only produces int vectors), integer
        # compare — i is an exact small integer in f32, so the convert is
        # lossless
        iota = jax.lax.broadcasted_iota(jnp.int32, (Mpts, s.shape[-1]), 0)
        onehot = jnp.where(iota == i.astype(jnp.int32)[None, :], 1.0, 0.0)
        # (12, M) @ (M, B) -> (12, B): rows [p0(3), p1(3), p2(3), p3(3)]
        # (table arrives pre-transposed — no in-kernel relayout)
        pts = jnp.dot(table_vals, onehot,
                      preferred_element_type=jnp.float32)
        p0, p1, p2, p3 = pts[0:3], pts[3:6], pts[6:9], pts[9:12]
        t2 = t * t
        t3 = t2 * t
        pos = 0.5 * ((2.0 * p1)
                     + (-p0 + p2) * t
                     + (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3) * t2
                     + (-p0 + 3.0 * p1 - 3.0 * p2 + p3) * t3)
        dp_du = 0.5 * ((-p0 + p2)
                       + 2.0 * (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3) * t
                       + 3.0 * (-p0 + 3.0 * p1 - 3.0 * p2 + p3) * t2)
        return pos, dp_du * (Mpts - 1)

    def aero_rows(x, u):
        """alpha/beta/v2 at the knot state — the aero_state slice the
        residual guards and envelope rows read (dynamics/aircraft.py:131-152
        in rows form; same math as _derivative_core's prologue)."""
        from aircraft_tpu.kernels.rollout_kernel import _asin, _atan2

        v = x[3:6]
        qx, qy, qz, qw = x[6], x[7], x[8], x[9]
        ux, uy, uz = -qx, -qy, -qz
        tx = 2.0 * (uy * v[2] - uz * v[1])
        ty = 2.0 * (uz * v[0] - ux * v[2])
        tz = 2.0 * (ux * v[1] - uy * v[0])
        vr0 = v[0] + qw * tx + (uy * tz - uz * ty) + C["eps"]
        vr1 = v[1] + qw * ty + (uz * tx - ux * tz) + C["eps"]
        vr2 = v[2] + qw * tz + (ux * ty - uy * tx) + C["eps"]
        v2 = vr0 * vr0 + vr1 * vr1 + vr2 * vr2
        airspeed = jnp.sqrt(v2 + C["eps"])
        # quadrant-correct (solver line searches visit reversed-flow
        # states; see rollout_kernel._atan2)
        alpha = _atan2(vr2, vr0 + C["eps"])
        beta = _asin(jnp.clip(vr1 / airspeed, -1.0, 1.0))
        return alpha, beta, v2

    def progress_terms(x):
        s = x[13]
        pos, tan = track_lookup(s)
        tangent = jnp.stack([tan[d] * (dm[d] * Linv) for d in range(3)])
        tnorm = jnp.sqrt(tangent[0] ** 2 + tangent[1] ** 2 + tangent[2] ** 2)
        denom = jnp.where(tnorm > 1e-3, tnorm, 1.0)
        tdir = tangent / denom[None, :]
        v = x[3:6]
        s_dot = (v[0] * tdir[0] + v[1] * tdir[1] + v[2] * tdir[2]) * Linv
        pos_err = jnp.stack([(x[d] - pos[d]) * dm[d] for d in range(3)])
        corr = (pos_err[0] * tdir[0] + pos_err[1] * tdir[1]
                + pos_err[2] * tdir[2]) * Linv
        return s, s_dot, corr, pos_err

    def knot_outputs(x, w, rf):
        """(x_next, residuals, envelope g, rest) — the full per-knot
        formulation (control/mhtt.py build_mhtt_ocp, rows layout)."""
        u = squash(w)
        s, s_dot, corr, pos_err = progress_terms(x)
        # --- plant step: RK4(13-state) x substeps + Euler progress
        xn = x
        for _ in range(ws.substeps):
            xn = _rk4_norm(xn, u, dt_sub, C, mlp)
        s_next = jnp.clip(s + s_dot * dt + ws.progress_correction * corr,
                          0.0, 1.05)
        rows = [xn[i] for i in range(13)] + [s_next]
        rows += [jnp.zeros_like(s_next)] * (XR - 14)
        x_next = jnp.stack(rows)

        # --- residual rows (control/mhtt.py stage_residuals order)
        v = x[3:6]
        speed = jnp.sqrt(v[0] ** 2 + v[1] ** 2 + v[2] ** 2)
        alpha, beta, v2 = aero_rows(x, u)
        r = [np.sqrt(2.0 * W_TRACKING) * pos_err[d] for d in range(3)]
        r.append(np.sqrt(2.0 * W_BACKWARD) * jnp.maximum(0.0, -s_dot))
        r.append(np.sqrt(2.0 * W_LOW_VELOCITY)
                 * jnp.maximum(0.1 - speed, 0.0))
        for c in range(7):
            r.append(np.sqrt(2.0 * W_CONTROL) * u[c])
        r.append(np.sqrt(2.0) * jnp.maximum(speed - 110.0, 0.0))
        if ws.w_speed > 0.0:
            r.append(np.sqrt(2.0 * ws.w_speed) * (speed - ws.v_ref))
            r.append(np.sqrt(2.0 * ws.stall_factor * ws.w_speed)
                     * jnp.maximum((ws.v_ref - ws.stall_margin) - speed, 0.0))
        if ws.w_rate > 0.0:
            for d in range(3):
                r.append(np.sqrt(2.0 * ws.w_rate) * x[10 + d])
        if ws.alpha_guard > 0.0:
            r.append(np.sqrt(20.0)
                     * jnp.maximum(jnp.abs(alpha) - ws.alpha_guard, 0.0))
        if ws.beta_guard > 0.0:
            r.append(np.sqrt(20.0)
                     * jnp.maximum(jnp.abs(beta) - ws.beta_guard, 0.0))
        r = jnp.stack(r)

        # --- stage inequality rows (control/aircraft.py envelope_ineq):
        # AL box rows first when the formulation keeps them (no squash),
        # then the 7 envelope rows; padded to ng_pad
        g_rows = []
        if ws.include_box:
            for c in range(7):
                g_rows.append(u[c] - ws.box_ub[c])
            for c in range(7):
                g_rows.append(ws.box_lb[c] - u[c])
        g_rows += [
            (ws.speed_lo2 - v2) * ws.lo_scale,
            (v2 - ws.speed_hi2) * ws.hi_scale,
            beta - ws.beta_lim,
            -ws.beta_lim - beta,
            alpha - ws.alpha_lim,
            -ws.alpha_lim - alpha,
            x[2],
        ]
        while len(g_rows) < ws.ng_pad:
            g_rows.append(jnp.zeros_like(x[2]))
        g = jnp.stack(g_rows)

        rate_reward = 0.5 * jnp.tanh(s_dot / 0.5)
        rest = (-W_PROGRESS * s - W_PROGRESS_RATE * rate_reward) * rf
        return x_next, r, g, rest[None, :]

    def al_cost(x, w, rf, lam_k, mu, mu_row):
        """AL stage cost (solvers/ocp.al_stage_cost) — shares knot_outputs'
        primal pipeline; returns (cost (B,), x_next (XR,B))."""
        x_next, r, g, rest = knot_outputs(x, w, rf)
        c = 0.5 * jnp.sum(r * r, axis=0) + rest[0]
        mu_g = mu[None, :] * mu_row
        gplus = jnp.maximum(g + lam_k / mu_g, 0.0)
        c = c + 0.5 * jnp.sum(mu_g * gplus * gplus, axis=0)
        c = c - 0.5 * jnp.sum(lam_k * lam_k / mu_g, axis=0)
        return c, x_next

    def terminal_cost(x):
        """W_TERMINAL_ALIGN * ||(p - track(s))*mask + 1e-9|| - 50 s
        (control/mhtt.py terminal_cost, incl. its 1e-9 vector shift)."""
        s = x[13]
        pos, _ = track_lookup(s)
        e = [(x[d] - pos[d]) * dm[d] + 1e-9 for d in range(3)]
        align = jnp.sqrt(e[0] ** 2 + e[1] ** 2 + e[2] ** 2)
        return W_TERMINAL_ALIGN * align - W_PROGRESS * 10.0 * s

    return knot_outputs, al_cost, terminal_cost


# ---------------------------------------------------------------------------
# kernel factories
# ---------------------------------------------------------------------------


def make_backward_kernel(ws: WindowSpec, params: AircraftParams, table,
                         *, gain_clip: float = 1e4,
                         interpret: bool = False):
    """Build backward(xs_t, ws_t, lam_t, scal_t, murow_t, vxT_t, vxxT_t,
    restfac) -> (K_t, kff_t, misc_t).

    Shapes (T tiles of 128 lanes):
      xs_t   (T, N+1, XR, L)    lam_t  (T, N, NG, L)
      ws_t   (T, N, UR, L)      scal_t (T, 8, L): row0 mu, row1 reg
      murow_t(T, NG, L)         vxT_t  (T, XR, L)
      vxxT_t (T, XR, XR, L)     restfac (N, 1) SMEM
      K_t    (T, N, UR, XR, L)  kff_t  (T, N, UR, L)
      misc_t (T, 8, L): rows [dv1, dv2, qu_max, fail]
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, _ = _build_constants(params)
    is_mlp = isinstance(params.coeff, MLPCoeffParams)
    smem_w = fold_mlp_constants(params) if is_mlp else ()
    N = ws.N
    NR = n_residual_rows(ws)
    NGR = n_ineq_rows(ws)
    NGP = ws.ng_pad
    tableT = np.ascontiguousarray(np.asarray(table, np.float32).T)  # (12, M)

    def kernel(xs_ref, ws_ref, lam_ref, scal_ref, murow_ref, vxT_ref,
               vxxT_ref, table_ref, *rest):
        *w_refs, restfac_ref, K_ref, kff_ref, misc_ref = rest
        # coefficient model: MLP as SMEM scalar-FMA chains (no per-dot MXU
        # dispatch; linearize traces straight through), or the default
        # model's closed form (the course's plant)
        coeff6 = (wrap_mlp_coeff(make_smem_mlp(*w_refs), C["Cn_rudder"])
                  if is_mlp else make_default_coeff(params.coeff))

        knot_outputs, _, _ = _make_knot_fns(ws, C, coeff6, table_ref[:])

        mu = scal_ref[0, 0]        # (L,)
        reg = scal_ref[0, 1]
        mu_row = murow_ref[0]      # (NG, L)
        mu_g = mu[None, :] * mu_row

        B = mu.shape[-1]
        # linearization basis: NDIR directions over (x(XR), w(UR)) rows
        tdim = jax.lax.broadcasted_iota(jnp.int32, (NDIR, XR, B), 0)
        rdim = jax.lax.broadcasted_iota(jnp.int32, (NDIR, XR, B), 1)
        basis_x = jnp.where((tdim == rdim) & (tdim < 14), 1.0, 0.0)
        tdim_u = jax.lax.broadcasted_iota(jnp.int32, (NDIR, UR, B), 0)
        cdim_u = jax.lax.broadcasted_iota(jnp.int32, (NDIR, UR, B), 1)
        basis_u = jnp.where((tdim_u - 14) == cdim_u, 1.0, 0.0)

        def riccati_step(i, carry):
            Vx, Vxx, dv1, dv2, qumax, fail = carry
            k = N - 1 - i
            x = xs_ref[0, k]
            w = ws_ref[0, k]
            lam_k = lam_ref[0, k]
            rf = restfac_ref[k, 0]

            primal_out, lin = jax.linearize(
                lambda xx, ww: knot_outputs(xx, ww, rf), x, w)
            _, r, g, rest_row = primal_out
            dxn, dr, dg, drest = jax.vmap(lin)(basis_x, basis_u)
            # dxn (NDIR, XR, B): dxn[t, i] = d x_next_i / d in_t

            # --- AL Gauss-Newton assembly (solvers/ilqr._quadraticize_gn,
            # residual form): grad = Jr^T r + Jg^T y + grad(rest),
            # curvature = Jr^T Jr + Jg^T W Jg
            act = (g + lam_k / mu_g) > 0.0
            y = jnp.where(act, lam_k + mu_g * g, 0.0)
            wgt = jnp.where(act, mu_g, 0.0)

            grad = (jnp.sum(dr * r[None, :, :], axis=1)
                    + jnp.sum(dg * y[None, :, :], axis=1)
                    + drest[:, 0, :])                      # (NDIR, B)
            H = None
            for j in range(NR):
                col = _take1(dr, j, 1)                      # (NDIR, 1, B)
                term = col * jnp.swapaxes(col, 0, 1)
                H = term if H is None else H + term
            for j in range(NGR):   # padded g rows are identically zero
                col = _take1(dg, j, 1)
                wrow = jnp.expand_dims(_take1(wgt, j, 0), 0)  # (1, 1, B)
                term = col * jnp.swapaxes(col, 0, 1) * wrow
                H = H + term                                # (NDIR, NDIR, B)

            lx = _sanitize(grad[:14], 1e8)
            lu = _sanitize(grad[14:], 1e8)
            lxx = _sanitize(H[:14, :14], 1e8)
            luu = _sanitize(H[14:, 14:], 1e8)
            lux = _sanitize(H[14:, :14], 1e8)
            AT = _sanitize(dxn[:14, :14], 1e6)   # AT[t,i] = A[i,t]
            BT = _sanitize(dxn[14:, :14], 1e6)   # BT[c,i] = B[i,c]

            # --- Riccati recursion (solvers/riccati.backward_sequential)
            Qx = lx + _mv(AT, Vx)
            Qu = lu + _mv(BT, Vx)
            MA = _mm(AT, Vxx)               # (14, 14, B) = A^T Vxx
            Qxx = lxx + _mmT(MA, AT)        # A^T Vxx A
            MB = _mm(BT, Vxx)               # (7, 14, B)
            Quu = luu + _mmT(MB, BT)        # (7, 7, B)
            Qux = lux + _mmT(MB, AT)        # (7, 14, B)

            a_rows = [[(0.5 * (Quu[i, j] + Quu[j, i]) + reg) if i == j
                       else 0.5 * (Quu[i, j] + Quu[j, i])
                       for j in range(7)] for i in range(7)]
            rhs_rows = [[Qu[i]] + [Qux[i, j] for j in range(14)]
                        for i in range(7)]
            sol, bad = _chol_solve_lanes(a_rows, rhs_rows, 7, 15)
            kff = jnp.clip(-jnp.stack(sol[0]), -gain_clip, gain_clip)
            Kmat = jnp.clip(
                -jnp.stack([jnp.stack(sol[1 + j]) for j in range(14)],
                           axis=0),
                -gain_clip, gain_clip)      # (14, 7, B): K^T[t, c]
            KT = Kmat                        # KT[i, c] = K[c, i]

            # value update: Vx' = Qx + K^T Quu k + K^T Qu + Qux^T k
            Quu_k = _mv(Quu, kff)                       # (7, B)
            Vx_new = (Qx + _mv(KT, Quu_k) + _mv(KT, Qu)
                      + jnp.sum(Qux * kff[:, None, :], axis=0))
            KQ = _mm(KT, Quu)                            # (14, 7, B)
            KQx = _mm(KT, Qux)                           # (14, 14, B)
            Vxx_new = (Qxx + _mmT(KQ, KT)
                       + KQx + jnp.swapaxes(KQx, 0, 1))
            Vxx_new = 0.5 * (Vxx_new + jnp.swapaxes(Vxx_new, 0, 1))
            lim = 1e14
            Vx_new = _sanitize(Vx_new, lim)
            Vxx_new = _sanitize(Vxx_new, lim)

            qu_abs = jnp.max(jnp.abs(Qu), axis=0)
            dv1 = dv1 + jnp.sum(kff * Qu, axis=0)
            dv2 = dv2 + 0.5 * jnp.sum(kff * Quu_k, axis=0)
            qumax = jnp.maximum(qumax, qu_abs)
            # fail carried as f32 0/1: a BOOL vector in a fori_loop carry
            # fails Mosaic legalization ('scf.for' legalize error)
            fail = jnp.maximum(fail, bad.astype(jnp.float32))

            # store gains: K rows (UR, XR): K[c, i] = KT[i, c] — padded by
            # concatenation (in-kernel scatter has no Mosaic lowering)
            Kst = _pad_rows(
                jnp.concatenate(
                    [jnp.swapaxes(KT, 0, 1),
                     jnp.zeros((7, XR - 14, B), jnp.float32)], axis=1),
                UR)
            K_ref[0, k] = Kst
            kff_ref[0, k] = _pad_rows(kff, UR)
            return (Vx_new, Vxx_new, dv1, dv2, qumax, fail)

        B = LANES
        Vx0 = vxT_ref[0][:14]
        Vxx0 = vxxT_ref[0][:14, :14]
        zeros = jnp.zeros((B,), jnp.float32)
        init = (Vx0, Vxx0, zeros, zeros, zeros, zeros)
        _, _, dv1, dv2, qumax, fail = jax.lax.fori_loop(
            0, N, riccati_step, init)
        misc_ref[0] = _pad_rows(jnp.stack([dv1, dv2, qumax, fail]), 8)

    def backward(xs_t, ws_t, lam_t, scal_t, murow_t, vxT_t, vxxT_t,
                 restfac):
        T = xs_t.shape[0]
        grid = (T,)
        vm = pltpu.VMEM
        out = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((T, N, UR, XR, LANES), jnp.float32),
                jax.ShapeDtypeStruct((T, N, UR, LANES), jnp.float32),
                jax.ShapeDtypeStruct((T, 8, LANES), jnp.float32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, N + 1, XR, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, N, UR, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, N, NGP, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, NGP, LANES), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, XR, LANES), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, XR, XR, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec(tableT.shape, lambda i: (0, 0),
                             memory_space=vm),
            ] + [
                pl.BlockSpec(w.shape, (lambda i, nd=w.ndim: (0,) * nd),
                             memory_space=pltpu.SMEM)
                for w in smem_w
            ] + [
                pl.BlockSpec((N, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, N, UR, XR, LANES),
                             lambda i: (i, 0, 0, 0, 0), memory_space=vm),
                pl.BlockSpec((1, N, UR, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                             memory_space=vm),
            ),
            compiler_params=pltpu.CompilerParams(
                # the gain block + linearize/JtJ transients exceed the
                # default 16M scoped-vmem budget; raise toward the part's
                # physical VMEM
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xs_t, ws_t, lam_t, scal_t, murow_t, vxT_t, vxxT_t,
          jnp.asarray(tableT), *[jnp.asarray(w) for w in smem_w],
          jnp.asarray(restfac))
        return out

    return backward


def make_forward_kernel(ws: WindowSpec, params: AircraftParams, table,
                        *, alphas: tuple, interpret: bool = False):
    """Build forward(xs_t, ws_t, K_t, kff_t, lam_t, scal_t, murow_t,
    restfac) -> (xs_new, ws_new, misc).

    misc rows: 0..A-1 candidate AL costs (incl. freeze penalties),
    row A   = best cost, row A+1 = frozen-knot count of best,
    row A+2 = chosen alpha.  alphas must include 0.0 (the incumbent).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, _ = _build_constants(params)
    is_mlp = isinstance(params.coeff, MLPCoeffParams)
    smem_w = fold_mlp_constants(params) if is_mlp else ()
    N = ws.N
    A = len(alphas)
    assert A + 3 <= 16
    NGP = ws.ng_pad
    tableT = np.ascontiguousarray(np.asarray(table, np.float32).T)  # (12, M)

    def kernel(xs_ref, ws_ref, K_ref, kff_ref, lam_ref, scal_ref,
               murow_ref, table_ref, *rest):
        *w_refs, restfac_ref, xso_ref, wso_ref, misc_ref = rest
        coeff6 = (wrap_mlp_coeff(make_smem_mlp(*w_refs), C["Cn_rudder"])
                  if is_mlp else make_default_coeff(params.coeff))

        _, al_cost, terminal_cost = _make_knot_fns(ws, C, coeff6, table_ref[:])

        mu = scal_ref[0, 0]
        mu_row = murow_ref[0]
        B = mu.shape[-1]

        def rollout_cost(alpha, store):
            """One feedback rollout at step size `alpha` ((B,) or scalar);
            returns (cost, nfro); writes the trajectory when `store`."""
            x0 = xs_ref[0, 0]

            def body(k, carry):
                x, cost, nfro = carry
                x_ref = xs_ref[0, k]
                w_ref = ws_ref[0, k]
                kff = kff_ref[0, k]
                Kk = K_ref[0, k]          # (UR, XR, B)
                dx = x - x_ref
                fb = jnp.sum(Kk * dx[None, :, :], axis=1)   # (UR, B)
                w = w_ref + alpha * kff + fb
                rf = restfac_ref[k, 0]
                c, x_next = al_cost(x, w, rf, lam_ref[0, k], mu, mu_row)
                # arithmetic all-finite (bool sublane reduce is shaky in
                # Mosaic): every row finite <=> sum of isfinite == XR
                nfin = jnp.sum(jnp.isfinite(x_next).astype(jnp.float32),
                               axis=0)
                finite = ((nfin == float(XR))
                          & (jnp.max(jnp.abs(x_next), axis=0) < 1e6))
                x_next = jnp.where(finite[None, :], x_next, x)
                if store:
                    xso_ref[0, pl.ds(k + 1, 1)] = x_next[None]
                    wso_ref[0, pl.ds(k, 1)] = w[None]
                return (x_next, cost + c, nfro + (1.0 - finite))

            zeros = jnp.zeros((B,), jnp.float32)
            xT, cost, nfro = jax.lax.fori_loop(
                0, N, body, (x0, zeros, zeros))
            cost = cost + terminal_cost(xT)
            cost = jnp.where(jnp.isnan(cost), jnp.inf, cost)
            cost = cost + FREEZE_PENALTY * nfro
            return cost, nfro

        costs = []
        for a in alphas:
            c, _ = rollout_cost(jnp.float32(a), store=False)
            costs.append(c)

        best_cost = costs[0]
        best_alpha = jnp.full((B,), jnp.float32(alphas[0]))
        for a, c in list(zip(alphas, costs))[1:]:
            better = c < best_cost
            best_cost = jnp.where(better, c, best_cost)
            best_alpha = jnp.where(better, jnp.float32(a), best_alpha)

        xso_ref[0, 0] = xs_ref[0, 0]
        _, nfro_best = rollout_cost(best_alpha, store=True)

        misc_ref[0] = _pad_rows(
            jnp.stack(costs + [best_cost, nfro_best, best_alpha]), 16)

    def forward(xs_t, ws_t, K_t, kff_t, lam_t, scal_t, murow_t, restfac):
        T = xs_t.shape[0]
        vm = pltpu.VMEM
        out = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((T, N + 1, XR, LANES), jnp.float32),
                jax.ShapeDtypeStruct((T, N, UR, LANES), jnp.float32),
                jax.ShapeDtypeStruct((T, 16, LANES), jnp.float32),
            ),
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, N + 1, XR, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, N, UR, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, N, UR, XR, LANES),
                             lambda i: (i, 0, 0, 0, 0), memory_space=vm),
                pl.BlockSpec((1, N, UR, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, N, NGP, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, NGP, LANES), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec(tableT.shape, lambda i: (0, 0),
                             memory_space=vm),
            ] + [
                pl.BlockSpec(w.shape, (lambda i, nd=w.ndim: (0,) * nd),
                             memory_space=pltpu.SMEM)
                for w in smem_w
            ] + [
                pl.BlockSpec((N, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, N + 1, XR, LANES),
                             lambda i: (i, 0, 0, 0), memory_space=vm),
                pl.BlockSpec((1, N, UR, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, 16, LANES), lambda i: (i, 0, 0),
                             memory_space=vm),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xs_t, ws_t, K_t, kff_t, lam_t, scal_t, murow_t,
          jnp.asarray(tableT), *[jnp.asarray(w) for w in smem_w],
          jnp.asarray(restfac))
        return out

    return forward
