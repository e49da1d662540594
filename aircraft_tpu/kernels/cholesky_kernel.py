"""Pallas TPU kernel: batched tiny-SPD Cholesky factor+solve.

The per-knot KKT blocks of the Riccati sweep are m×m SPD matrices with
m ≈ 7–16 — far below MXU tile size, so XLA executes them as scalar-ish
loops.  This kernel lays the BATCH on the 128-lane axis and unrolls the
m×m factorisation in registers: every lane factorises its own matrix
simultaneously, turning the "batch of tiny matrices" problem
(SURVEY §7 hard part 4) into pure VPU throughput.

Layout: A (B, m, m) is transposed to (m*m, B) rows-on-sublanes /
batch-on-lanes; the unrolled Cholesky–forward–backward sequence is ~m³/3
fused multiply-adds per lane with no data-dependent control flow.

`batched_cholesky_solve(A, rhs)` solves A X = rhs for (B, m, m) SPD A and
(B, m, k) rhs — the exact shape of the gain computation in
`riccati.backward_associative` (vmapped over N·B knots).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def _cholesky_solve_rows(a_rows, rhs_rows, m: int, k: int):
    """Unrolled Cholesky + triangular solves on row-vector registers.

    a_rows: list of m*m vectors (each (B,)), row-major A.
    rhs_rows: list of m*k vectors, row-major rhs.
    Returns list of m*k solution vectors.
    """
    # Cholesky: L (lower) with L[i][j] for j <= i
    L = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i + 1):
            s = a_rows[i * m + j]
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]

    out = [None] * (m * k)
    for col in range(k):
        # forward solve L y = b
        y = [None] * m
        for i in range(m):
            s = rhs_rows[i * k + col]
            for p in range(i):
                s = s - L[i][p] * y[p]
            y[i] = s / L[i][i]
        # backward solve L^T x = y
        x = [None] * m
        for i in reversed(range(m)):
            s = y[i]
            for p in range(i + 1, m):
                s = s - L[p][i] * x[p]
            x[i] = s / L[i][i]
        for i in range(m):
            out[i * k + col] = x[i]
    return out


def make_batched_cholesky_solve(m: int, k: int, *, interpret: bool = False):
    """Build `solve(A (B,m,m), rhs (B,m,k)) -> X (B,m,k)`; B must be a
    multiple of 128."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, r_ref, out_ref):
        a_rows = [a_ref[0, i] for i in range(m * m)]
        r_rows = [r_ref[0, i] for i in range(m * k)]
        x_rows = _cholesky_solve_rows(a_rows, r_rows, m, k)
        for i in range(m * k):
            out_ref[0, i] = x_rows[i]

    def solve(A: jax.Array, rhs: jax.Array) -> jax.Array:
        B = A.shape[0]
        assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"
        n_tiles = B // LANES
        a_t = A.reshape(n_tiles, LANES, m * m).transpose(0, 2, 1)
        r_t = rhs.reshape(n_tiles, LANES, m * k).transpose(0, 2, 1)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_tiles, m * k, LANES), A.dtype),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, m * m, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m * k, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m * k, LANES), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(a_t, r_t)
        return out.transpose(0, 2, 1).reshape(B, m, k)

    return solve
