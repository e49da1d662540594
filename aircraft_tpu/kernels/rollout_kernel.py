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


def _build_constants(params: AircraftParams):
    """Extract plant constants as host floats/arrays (trace-time literals)."""
    cp: MLPCoeffParams = params.coeff
    assert isinstance(cp, MLPCoeffParams), "kernel supports the MLP aero model"
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


def _derivative_rows(x, u, C, W):
    """ẋ for state block x (16, B) and control block u (8, B); returns
    (16, B) with padding rows zero.  Mirrors dynamics/aircraft.py
    state_derivative in explicit row form."""
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
    # forward-flight quadrant (u_rel > 0) — valid across the alpha envelope;
    # atan2/asin have no Pallas TPU lowering, so use the in-kernel atan
    alpha = _atan(vr2 / (vr0 + C["eps"]))
    beta = _asin(jnp.clip(vr1 / airspeed, -1.0, 1.0))
    qbar = 0.5 * RHO * v2

    # MLP coefficient model on inputs (5, B)
    w0, b0, w1, b1, w2, b2, in_mean, in_std, out_mean, out_std = W
    inp = jnp.stack([qbar, alpha, beta, ail, elev])  # (5, B)
    h = (inp - in_mean) / in_std
    h = jnp.dot(w0.T, h, preferred_element_type=jnp.float32) + b0.T
    h = jnp.dot(w1.T, h, preferred_element_type=jnp.float32) + b1.T
    h = jnp.tanh(h)
    h = jnp.dot(w2.T, h, preferred_element_type=jnp.float32) + b2.T
    coeff = h * out_std + out_mean  # (6, B)
    cn = coeff[5] + C["Cn_rudder"] * 6.0 * rud * DEG2RAD
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
    return jnp.stack(
        [v[0], v[1], v[2], a0, a1, a2, qd0, qd1, qd2, qd3, wd0, wd1, wd2,
         zeros, zeros, zeros]
    )


def _rk4_norm(x, u, dt_sub, C, W):
    k1 = _derivative_rows(x, u, C, W)
    k2 = _derivative_rows(x + 0.5 * dt_sub * k1, u, C, W)
    k3 = _derivative_rows(x + 0.5 * dt_sub * k2, u, C, W)
    k4 = _derivative_rows(x + dt_sub * k3, u, C, W)
    x = x + (dt_sub / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    # renormalise the quaternion rows (scatter has no Mosaic lowering —
    # rebuild the block by row-wise scaling instead)
    q = x[6:10]
    inv_norm = jax.lax.rsqrt(jnp.sum(q * q, axis=0) + 1e-12)
    scale = jnp.concatenate(
        [jnp.ones((6,) + inv_norm.shape, x.dtype),
         jnp.broadcast_to(inv_norm, (4,) + inv_norm.shape),
         jnp.ones((6,) + inv_norm.shape, x.dtype)],
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
    N = horizon
    dt_sub = dt / substeps

    def kernel(x0_ref, us_ref, *rest):
        *w_refs, out_ref = rest
        W = tuple(r[:] for r in w_refs)
        # refs carry the leading (1,)-block axis of the grid tiling
        x = x0_ref[0]  # (16, 128)
        out_ref[0, 0] = x

        def body(k, x):
            u = us_ref[0, k]  # (8, 128)
            for _ in range(substeps):
                x = _rk4_norm(x, u, dt_sub, C, W)
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
