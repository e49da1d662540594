"""Pallas TPU kernel: fused 6-DoF + MLP-surrogate batched rollout.

The north-star hot loop (BASELINE.json: "the surrogate MLP fused into the
integrator via Pallas"): a whole horizon of RK4 steps — aero pipeline,
neural coefficient model, forces/moments, Newton–Euler, quaternion
normalisation — executes with the state batch resident in VMEM, writing one
knot per step to the output. No HBM round-trips between substeps, no
per-step kernel launches.

Layout: the scenario batch rides the 128-wide lane axis; state features sit
on sublanes (padded 13 -> 16 rows, f32 tile (8, 128)). Every physics op is
an elementwise row combination across lanes; the MLP's three matmuls are
(16×5)(5×B), (32×16)(16×B), (6×32)(32×B) with B as the MXU N-dimension.

Scalar plant geometry enters the kernel as literals; the MLP tensors are
kernel inputs in VMEM (updatable without retrace). The jnp reference path
(`solvers/integrators.step`) is the correctness oracle — see
tests/test_kernels.py.

Reference parity: the physics matches dynamics/aircraft.py (itself checked
against the reference CasADi pipeline, reference
src/aircraft/dynamics/{base,aircraft}.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import RHO
from aircraft_tpu.dynamics.aircraft import AircraftParams, C_D_FLAPS, C_Z_FLAPS
from aircraft_tpu.dynamics.coefficients import DEG2RAD, MLPCoeffParams
from aircraft_tpu.dynamics import base as dyn_base

LANES = 128
STATE_ROWS = 16  # 13 padded to two f32 sublane tiles
CTRL_ROWS = 8    # 7 padded


def _atan(z):
    """arctan for Pallas TPU (atan/atan2 have no Mosaic lowering).

    Minimax polynomial on |z| <= 1 (Abramowitz & Stegun 4.4.49, |err| ~ 2e-8)
    with the reciprocal identity for |z| > 1 — branch-free via select.
    """
    inv = jnp.abs(z) > 1.0
    zz = jnp.where(inv, 1.0 / jnp.where(jnp.abs(z) > 1e-30, z, 1e-30), z)
    z2 = zz * zz
    poly = (
        0.9999993329
        + z2 * (-0.3332985605
        + z2 * (0.1994653599
        + z2 * (-0.1390853351
        + z2 * (0.0964200441
        + z2 * (-0.0559098861
        + z2 * (0.0218612288
        + z2 * (-0.0040540580)))))))
    )
    a = zz * poly
    return jnp.where(inv, jnp.sign(z) * (np.pi / 2.0) - a, a)


def _asin(t):
    """arcsin via atan(t / sqrt(1 - t²)) — valid away from |t| = 1 (the
    sideslip angle is well inside the envelope)."""
    t = jnp.clip(t, -0.999999, 0.999999)
    return _atan(t * jax.lax.rsqrt(1.0 - t * t))


def _atan2(y, x):
    """Quadrant-correct arctan2 for Pallas TPU.

    The bare `_atan(y/x)` is only valid for x > 0 (forward relative flow).
    That was fine for open-loop rollouts of healthy flight, but INSIDE the
    window solver the line search visits reversed-flow candidate states
    (u_rel < 0), where quadrant-blind alpha reads ~0 while the jnp path's
    arctan2 reads ~±π — the fused solver then judged tumbling states
    feasible and committed them (measured: ~10-20%% of fleet lanes
    returned solutions whose alpha rows violated by ~2.7 rad under the
    jnp evaluation while the kernel's own cost said they were clean)."""
    ax = jnp.abs(x)
    safe_x = jnp.where(ax > 1e-30, x,
                       jnp.where(x >= 0.0, 1e-30, -1e-30))
    base = _atan(y / safe_x)
    corr = jnp.where(x < 0.0,
                     jnp.where(y >= 0.0, np.float32(np.pi),
                               np.float32(-np.pi)),
                     0.0)
    return base + corr


def kernel_coeff_supported(params: AircraftParams) -> bool:
    """Which coefficient models the Pallas kernels implement in-kernel:
    the MLP surrogate (SMEM FMA chains) and the reference's hard-coded
    default linear aero (closed form).  Linear/poly/taylor stay on the
    jnp path."""
    from aircraft_tpu.dynamics.coefficients import DefaultCoeffParams

    return isinstance(params.coeff, (MLPCoeffParams, DefaultCoeffParams))


def _build_constants(params: AircraftParams):
    """Extract plant constants as host floats/arrays (trace-time literals).
    Returns (scalars, mlp_weights_or_None)."""
    cp = params.coeff
    assert kernel_coeff_supported(params), (
        "kernels support the MLP and default aero models")
    com = np.asarray(params.com, np.float32)
    J = np.asarray(
        dyn_base.inertia_about_com(params.static_inertia, params.mass, params.com),
        np.float32,
    )
    Jinv = np.linalg.inv(J).astype(np.float32)
    scalars = {
        "mass": float(params.mass),
        "S": float(params.S),
        "b": float(params.b),
        "c": float(params.c),
        "arm": float(params.rudder_moment_arm),
        "eps": float(params.epsilon),
        # small fixed geometry enters the kernel as scalar literals
        "com": tuple(float(v) for v in com),
        "gravity": tuple(float(v) for v in np.asarray(params.gravity, np.float32)),
        "J": tuple(tuple(float(v) for v in row) for row in J),
        "Jinv": tuple(tuple(float(v) for v in row) for row in Jinv),
        "Cn_rudder": float(cp.Cn_rudder),
    }
    if not isinstance(cp, MLPCoeffParams):
        return scalars, None
    # MLP tensors must be pallas_call INPUTS (captured array constants are
    # rejected); biases/scalers shaped 2-D for TPU layout
    weights = (
        np.asarray(cp.w0, np.float32),                 # (5, 16)
        np.asarray(cp.b0, np.float32)[None, :],        # (1, 16)
        np.asarray(cp.w1, np.float32),                 # (16, 32)
        np.asarray(cp.b1, np.float32)[None, :],        # (1, 32)
        np.asarray(cp.w2, np.float32),                 # (32, 6)
        np.asarray(cp.b2, np.float32)[None, :],        # (1, 6)
        np.asarray(cp.input_mean, np.float32)[:, None],   # (5, 1)
        np.asarray(cp.input_std, np.float32)[:, None],    # (5, 1)
        np.asarray(cp.output_mean, np.float32)[:, None],  # (6, 1)
        np.asarray(cp.output_std, np.float32)[:, None],   # (6, 1)
    )
    return scalars, weights


def _derivative_core(x, u, C, coeff6):
    """ẋ for state block x (R, …, B) and control block u (·, …, B); returns
    the same leading-R block with padding rows zero.  Mirrors
    dynamics/aircraft.py state_derivative in explicit row form; every op
    broadcasts over whatever batch dims follow the leading row axis, so the
    same code serves the lanes layout (rows = (128,) vectors) and the tiles
    layout (rows = (G, 128) full tiles).  `coeff6(qbar, alpha, beta, ail,
    elev, rud, rates) -> 6 coefficient rows` abstracts the coefficient
    model (MLP contraction or the default closed form) — the only
    model-specific op; it includes the rudder yaw increment."""
    v = x[3:6]
    qx, qy, qz, qw = x[6], x[7], x[8], x[9]
    wx, wy, wz = x[10], x[11], x[12]
    ail, elev, rud, flaps = u[0], u[1], u[2], u[6]

    # v_rel = conj(q) ⊗ (v,0) ⊗ q + eps   (Rodrigues with u_vec = -q.xyz)
    ux, uy, uz = -qx, -qy, -qz
    tx = 2.0 * (uy * v[2] - uz * v[1])
    ty = 2.0 * (uz * v[0] - ux * v[2])
    tz = 2.0 * (ux * v[1] - uy * v[0])
    vr0 = v[0] + qw * tx + (uy * tz - uz * ty) + C["eps"]
    vr1 = v[1] + qw * ty + (uz * tx - ux * tz) + C["eps"]
    vr2 = v[2] + qw * tz + (ux * ty - uy * tx) + C["eps"]

    v2 = vr0 * vr0 + vr1 * vr1 + vr2 * vr2
    airspeed = jnp.sqrt(v2 + C["eps"])
    # quadrant-correct alpha (jnp path parity: dynamics/aircraft.py:150
    # uses arctan2) — reversed-flow states visited by solver line searches
    # need the x<0 branch, see _atan2
    alpha = _atan2(vr2, vr0 + C["eps"])
    beta = _asin(jnp.clip(vr1 / airspeed, -1.0, 1.0))
    qbar = 0.5 * RHO * v2

    coeff = coeff6(qbar, alpha, beta, ail, elev, rud, (wx, wy, wz))
    cn = coeff[5]
    c0 = coeff[0] + C_D_FLAPS * flaps
    c2 = coeff[2] + C_Z_FLAPS * flaps

    qS = qbar * C["S"]
    f0 = c0 * qS * jnp.sign(vr0)
    f1 = coeff[1] * qS
    f2 = c2 * qS

    m0 = coeff[3] * qS * C["b"]
    m1 = coeff[4] * qS * C["c"]
    m2 = cn * qS * C["b"]
    # + com × F
    cx, cy, cz = C["com"]
    m0 = m0 + (cy * f2 - cz * f1)
    m1 = m1 + (cz * f0 - cx * f2)
    m2 = m2 + (cx * f1 - cy * f0)

    # v̇ = R(q) F / m + g  (Rodrigues forward)
    tx = 2.0 * (qy * f2 - qz * f1)
    ty = 2.0 * (qz * f0 - qx * f2)
    tz = 2.0 * (qx * f1 - qy * f0)
    inv_m = 1.0 / C["mass"]
    g = C["gravity"]
    a0 = (f0 + qw * tx + (qy * tz - qz * ty)) * inv_m + g[0]
    a1 = (f1 + qw * ty + (qz * tx - qx * tz)) * inv_m + g[1]
    a2 = (f2 + qw * tz + (qx * ty - qy * tx)) * inv_m + g[2]

    # q̇ = ½ q ⊗ (ω, 0)
    qd0 = 0.5 * (qw * wx + qy * wz - qz * wy)
    qd1 = 0.5 * (qw * wy - qx * wz + qz * wx)
    qd2 = 0.5 * (qw * wz + qx * wy - qy * wx)
    qd3 = 0.5 * (-qx * wx - qy * wy - qz * wz)

    # ω̇ = J⁻¹ (M − ω × J ω)
    J = C["J"]  # tuple-of-tuples of scalar literals
    Jw0 = J[0][0] * wx + J[0][1] * wy + J[0][2] * wz
    Jw1 = J[1][0] * wx + J[1][1] * wy + J[1][2] * wz
    Jw2 = J[2][0] * wx + J[2][1] * wy + J[2][2] * wz
    t0 = m0 - (wy * Jw2 - wz * Jw1)
    t1 = m1 - (wz * Jw0 - wx * Jw2)
    t2 = m2 - (wx * Jw1 - wy * Jw0)
    Ji = C["Jinv"]
    wd0 = Ji[0][0] * t0 + Ji[0][1] * t1 + Ji[0][2] * t2
    wd1 = Ji[1][0] * t0 + Ji[1][1] * t1 + Ji[1][2] * t2
    wd2 = Ji[2][0] * t0 + Ji[2][1] * t1 + Ji[2][2] * t2

    zeros = jnp.zeros_like(a0)
    rows = [v[0], v[1], v[2], a0, a1, a2, qd0, qd1, qd2, qd3, wd0, wd1, wd2]
    rows += [zeros] * (x.shape[0] - len(rows))
    return jnp.stack(rows)


def _rk4_norm(x, u, dt_sub, C, coeff6):
    k1 = _derivative_core(x, u, C, coeff6)
    k2 = _derivative_core(x + 0.5 * dt_sub * k1, u, C, coeff6)
    k3 = _derivative_core(x + 0.5 * dt_sub * k2, u, C, coeff6)
    k4 = _derivative_core(x + dt_sub * k3, u, C, coeff6)
    x = x + (dt_sub / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    # renormalise the quaternion rows (scatter has no Mosaic lowering —
    # rebuild the block by row-wise scaling instead)
    q = x[6:10]
    inv_norm = jax.lax.rsqrt(jnp.sum(q * q, axis=0) + 1e-12)
    scale = jnp.concatenate(
        [jnp.ones((6,) + inv_norm.shape, x.dtype),
         jnp.broadcast_to(inv_norm, (4,) + inv_norm.shape),
         jnp.ones((x.shape[0] - 10,) + inv_norm.shape, x.dtype)],
        axis=0,
    )
    return x * scale


def make_fused_rollout(
    params: AircraftParams,
    *,
    horizon: int,
    dt: float,
    substeps: int = 1,
    interpret: bool = False,
):
    """Build `rollout(x0 (B,13), us (B,N,7)) -> xs (B,N+1,13)` running the
    whole horizon inside one Pallas kernel per 128-scenario tile.  B must be
    a multiple of 128 (pad the batch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, weights = _build_constants(params)
    assert weights is not None, "fused rollout kernels require the MLP model"
    N = horizon
    dt_sub = dt / substeps

    def kernel(x0_ref, us_ref, *rest):
        *w_refs, out_ref = rest
        w0, b0, w1, b1, w2, b2, in_mean, in_std, out_mean, out_std = (
            r[:] for r in w_refs
        )

        def mlp(qbar, alpha, beta, ail, elev):
            # batch rides the MXU N-dimension: (16×5)(5×B) … (6×32)(32×B)
            inp = jnp.stack([qbar, alpha, beta, ail, elev])  # (5, B)
            h = (inp - in_mean) / in_std
            h = jnp.dot(w0.T, h, preferred_element_type=jnp.float32) + b0.T
            h = jnp.dot(w1.T, h, preferred_element_type=jnp.float32) + b1.T
            h = jnp.tanh(h)
            h = jnp.dot(w2.T, h, preferred_element_type=jnp.float32) + b2.T
            return h * out_std + out_mean  # (6, B)

        coeff6 = wrap_mlp_coeff(mlp, C["Cn_rudder"])

        # refs carry the leading (1,)-block axis of the grid tiling
        x = x0_ref[0]  # (16, 128)
        out_ref[0, 0] = x

        def body(k, x):
            u = us_ref[0, k]  # (8, 128)
            for _ in range(substeps):
                x = _rk4_norm(x, u, dt_sub, C, coeff6)
            out_ref[0, pl.ds(k + 1, 1)] = x[None]
            return x

        jax.lax.fori_loop(0, N, body, x)

    def rollout(x0: jax.Array, us: jax.Array) -> jax.Array:
        B = x0.shape[0]
        assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"
        n_tiles = B // LANES
        # (B, 13) -> (tiles, 16, 128)
        x0_t = jnp.zeros((n_tiles, STATE_ROWS, LANES), x0.dtype)
        x0_t = x0_t.at[:, :13].set(
            x0.reshape(n_tiles, LANES, 13).transpose(0, 2, 1)
        )
        us_t = jnp.zeros((n_tiles, N, CTRL_ROWS, LANES), us.dtype)
        us_t = us_t.at[:, :, :7].set(
            us.reshape(n_tiles, LANES, N, 7).transpose(0, 2, 3, 1)
        )

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_tiles, N + 1, STATE_ROWS, LANES), x0.dtype),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, STATE_ROWS, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, CTRL_ROWS, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec(w.shape, (lambda i: (0,) * w.ndim),
                             memory_space=pltpu.VMEM)
                for w in weights
            ],
            out_specs=pl.BlockSpec((1, N + 1, STATE_ROWS, LANES),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x0_t, us_t, *weights)
        # (tiles, N+1, 16, 128) -> (B, N+1, 13)
        return out[:, :, :13].transpose(0, 3, 1, 2).reshape(B, N + 1, 13)

    return rollout


def fold_mlp_constants(params: AircraftParams):
    """MLP weights with the input scaler folded into layer 0 and the output
    scaler into layer 2 — the SMEM scalar-FMA form of the surrogate
    (removes 22 tile-ops per evaluation; shared by the tiles rollout kernel
    and the fused window kernels).  Returns
    (w0f (5,16), b0f (16,), w1f (16,32), b1f (32,), w2f (32,6), b2f (6,))."""
    _, weights = _build_constants(params)
    (w0, b0, w1, b1, w2, b2, in_mean, in_std, out_mean, out_std) = weights
    in_mean, in_std = in_mean[:, 0], in_std[:, 0]
    out_mean, out_std = out_mean[:, 0], out_std[:, 0]
    w0f = (w0 / in_std[:, None]).astype(np.float32)              # (5, 16)
    b0f = (b0[0] - in_mean @ w0f).astype(np.float32)             # (16,)
    w1f, b1f = w1.astype(np.float32), b1[0].astype(np.float32)   # (16,32),(32,)
    w2f = (w2 * out_std[None, :]).astype(np.float32)             # (32, 6)
    b2f = (b2[0] * out_std + out_mean).astype(np.float32)        # (6,)
    return (w0f, b0f, w1f, b1f, w2f, b2f)


def wrap_mlp_coeff(mlp5, Cn_rudder: float):
    """Adapt a 5-input MLP closure to the coeff6 interface (adds the
    reference's rudder yaw increment, dynamics/coefficients.py:314)."""
    def coeff6(qbar, alpha, beta, ail, elev, rud, rates):
        out = mlp5(qbar, alpha, beta, ail, elev)
        cn = out[5] + Cn_rudder * 6.0 * rud * DEG2RAD
        return jnp.concatenate([out[:5], cn[None]], axis=0)

    return coeff6


def make_default_coeff(cp):
    """The reference's hard-coded linear aero as a coeff6 closure
    (dynamics/coefficients.py _apply_default; reference
    coefficient_models.py:41-78) — closed form, no kernel inputs."""
    def coeff6(qbar, alpha, beta, ail, elev, rud, rates):
        p, q, r = rates
        CD = cp.CD0 + cp.CD_alpha * alpha * alpha
        CL = cp.CL0 + cp.CL_alpha * alpha
        CY = cp.CY_beta * beta
        Cl = cp.Cl_aileron * 4.0 * ail * DEG2RAD + cp.Cl_p * p
        Cm = cp.Cm_elevator * 5.0 * elev * DEG2RAD + cp.Cm_q * q
        Cn = cp.Cn_rudder * 6.0 * rud * DEG2RAD + cp.Cn_r * r
        return jnp.stack([-CD, CY, -CL, Cl, Cm, Cn])

    return coeff6


def make_smem_mlp(w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref):
    """Scalar-broadcast FMA surrogate evaluation from SMEM weight refs —
    broadcasts over ANY trailing batch shape of its inputs (rows can be
    (B,), (A, B), or tangent-batched (NDIR, ..., B)), which is what lets
    the same closure serve the rollout-tiles kernel AND the linearized
    window kernels (jax.linearize traces straight through the FMA chain;
    no MXU dispatch per tiny dot)."""
    n0 = b0_ref.shape[0]
    n1 = b1_ref.shape[0]
    n2 = b2_ref.shape[0]
    ni = w0_ref.shape[0]
    W0 = [[w0_ref[i, j] for j in range(n0)] for i in range(ni)]
    B0 = [b0_ref[j] for j in range(n0)]
    W1 = [[w1_ref[i, j] for j in range(n1)] for i in range(n0)]
    B1 = [b1_ref[j] for j in range(n1)]
    W2 = [[w2_ref[i, j] for j in range(n2)] for i in range(n1)]
    B2 = [b2_ref[j] for j in range(n2)]

    def mlp(qbar, alpha, beta, ail, elev):
        inp = (qbar, alpha, beta, ail, elev)
        h1 = []
        for j in range(n0):
            acc = inp[0] * W0[0][j] + B0[j]
            for i in range(1, len(inp)):
                acc = acc + inp[i] * W0[i][j]
            h1.append(acc)
        h2 = []
        for j in range(n1):
            acc = h1[0] * W1[0][j] + B1[j]
            for i in range(1, n0):
                acc = acc + h1[i] * W1[i][j]
            h2.append(jnp.tanh(acc))
        out = []
        for j in range(n2):
            acc = h2[0] * W2[0][j] + B2[j]
            for i in range(1, n1):
                acc = acc + h2[i] * W2[i][j]
            out.append(acc)
        return jnp.stack(out)   # (6, *batch)

    return mlp


def make_fused_rollout_tiles(
    params: AircraftParams,
    *,
    horizon: int,
    dt: float,
    substeps: int = 1,
    group: int = 8,
    interpret: bool = False,
):
    """Full-tile variant of the fused rollout: each state component is a
    whole (group, 128) vreg tile, so every physics op runs at full VPU
    occupancy on group*128 scenarios — the lanes layout above leaves 7/8 of
    the sublanes idle on its (1, 128) row ops.

    The trade: the MLP can no longer ride the MXU (its batch axis now spans
    sublanes AND lanes, and Mosaic has no cheap (G,128)->(1, G*128)
    relayout), so the three matmuls become scalar-broadcast FMA chains with
    the weights in SMEM.  Input/output normalisation is folded into the
    first/last layer weights host-side, which removes 22 tile-ops per
    evaluation.  Net: ~1k full tiles per derivative eval for 1024
    scenarios vs ~230 eighth-occupancy ops per 128 — roughly 2x.

    Returns `rollout(x0 (B,13), us (B,N,7)) -> xs (B,N+1,13)`; B must be a
    multiple of group*128.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, _w = _build_constants(params)
    assert _w is not None, "fused rollout kernels require the MLP model"
    smem_arrays = fold_mlp_constants(params)
    (w0f, b0f, w1f, b1f, w2f, b2f) = smem_arrays

    N = horizon
    dt_sub = dt / substeps
    G = group
    R, CR = 13, 7
    n0, n1, n2 = w0f.shape[1], w1f.shape[1], w2f.shape[1]

    def kernel(x0_ref, us_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref,
               b2_ref, out_ref):
        # hoist every weight scalar out of the step loops (read once,
        # closed over by all 4*substeps derivative evaluations)
        W0 = [[w0_ref[i, j] for j in range(n0)] for i in range(w0f.shape[0])]
        B0 = [b0_ref[j] for j in range(n0)]
        W1 = [[w1_ref[i, j] for j in range(n1)] for i in range(w1f.shape[0])]
        B1 = [b1_ref[j] for j in range(n1)]
        W2 = [[w2_ref[i, j] for j in range(n2)] for i in range(w2f.shape[0])]
        B2 = [b2_ref[j] for j in range(n2)]

        def mlp(qbar, alpha, beta, ail, elev):
            inp = (qbar, alpha, beta, ail, elev)
            h1 = []
            for j in range(n0):
                acc = inp[0] * W0[0][j] + B0[j]
                for i in range(1, len(inp)):
                    acc = acc + inp[i] * W0[i][j]
                h1.append(acc)
            h2 = []
            for j in range(n1):
                acc = h1[0] * W1[0][j] + B1[j]
                for i in range(1, n0):
                    acc = acc + h1[i] * W1[i][j]
                h2.append(jnp.tanh(acc))
            out = []
            for j in range(n2):
                acc = h2[0] * W2[0][j] + B2[j]
                for i in range(1, n1):
                    acc = acc + h2[i] * W2[i][j]
                out.append(acc)
            return jnp.stack(out)  # (6, G, 128)

        coeff6 = wrap_mlp_coeff(mlp, C["Cn_rudder"])

        x = x0_ref[0]  # (13, G, 128)
        out_ref[0, 0] = x

        def body(k, x):
            u = us_ref[0, k]  # (7, G, 128)
            x = jax.lax.fori_loop(
                0, substeps,
                lambda s, x: _rk4_norm(x, u, dt_sub, C, coeff6), x
            )
            out_ref[0, pl.ds(k + 1, 1)] = x[None]
            return x

        jax.lax.fori_loop(0, N, body, x)

    def rollout(x0: jax.Array, us: jax.Array) -> jax.Array:
        B = x0.shape[0]
        per_tile = G * LANES
        assert B % per_tile == 0, f"batch {B} must be a multiple of {per_tile}"
        T = B // per_tile
        x0_t = x0.reshape(T, G, LANES, R).transpose(0, 3, 1, 2)
        us_t = us.reshape(T, G, LANES, N, CR).transpose(0, 3, 4, 1, 2)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, N + 1, R, G, LANES), x0.dtype),
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, R, G, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, CR, G, LANES), lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec(a.shape, (lambda i, nd=a.ndim: (0,) * nd),
                             memory_space=pltpu.SMEM)
                for a in smem_arrays
            ],
            out_specs=pl.BlockSpec((1, N + 1, R, G, LANES),
                                   lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x0_t, us_t, *smem_arrays)
        return out.transpose(0, 3, 4, 1, 2).reshape(B, N + 1, R)

    return rollout
