"""Observability: solver metrics, constraint descriptions, logging, timers,
and NaN diagnosis — strictly off the solve hot path.

Covers the reference's scattered diagnostics (SURVEY §5.1/§5.5):
  * `extract_solver_metrics` over IPOPT stats  (control/base.py:479-506)
  * the constraint-description registry        (control/base.py:228-265)
  * timestamped file logging                   (control/base.py:508-541)
  * rich per-solve diagnostics                 (control/aircraft.py:81-147)
  * the NaN-Jacobian locator                   (main/control/quad_control.py:11-112)
plus compile-vs-execute timers and solves/s counters the TPU rebuild needs.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# solver metrics
# ---------------------------------------------------------------------------


def solver_metrics(sol, wall_time: Optional[float] = None) -> dict:
    """Summary dict from an ILQRSolution (single or batched) — the analogue
    of the reference's IPOPT stats extraction."""
    cost = np.asarray(sol.cost)
    viol = np.asarray(sol.violation)
    conv = np.asarray(sol.converged)
    iters = np.asarray(sol.iterations)
    batched = cost.ndim > 0 and cost.size > 1
    m = {
        "batched": bool(batched),
        "n_scenarios": int(cost.size),
        "success_rate": float(np.mean(conv)),
        "final_objective": float(np.mean(cost[np.isfinite(cost)])) if np.any(np.isfinite(cost)) else float("nan"),
        "primal_inf": float(np.max(viol)),
        "iterations": float(np.mean(iters)),
        "grad_norm": float(np.max(np.asarray(sol.grad_norm))),
    }
    if wall_time is not None:
        m["total_time"] = wall_time
        m["solves_per_s"] = cost.size / wall_time if wall_time > 0 else float("inf")
    return m


# ---------------------------------------------------------------------------
# constraint-description registry (maps constraint rows -> human meaning)
# ---------------------------------------------------------------------------


@dataclass
class ConstraintRegistry:
    """Named, fixed-size constraint blocks; `describe(i)` maps a violation
    row index back to its meaning (the reference auto-described each Opti
    row, control/base.py:228-265)."""

    blocks: list = field(default_factory=list)  # (name, size)

    def register(self, name: str, size: int) -> None:
        self.blocks.append((name, size))

    @property
    def total(self) -> int:
        return sum(s for _, s in self.blocks)

    def describe(self, index: int) -> str:
        i = index
        for name, size in self.blocks:
            if i < size:
                return f"{name}[{i}]" if size > 1 else name
            i -= size
        return f"<unknown row {index}>"

    def report_violations(self, g: np.ndarray, tol: float = 1e-6) -> list[str]:
        """Human-readable list of violated rows of a stage inequality
        evaluation g <= 0."""
        g = np.asarray(g)
        out = []
        for i in np.where(g > tol)[0]:
            out.append(f"{self.describe(int(i))}: {g[i]:.3e}")
        return out


# ---------------------------------------------------------------------------
# logging (reference control/base.py:508-541)
# ---------------------------------------------------------------------------


def make_logger(name: str = "aircraft_tpu", log_dir: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        ts = datetime.now().strftime("%Y%m%d_%H%M%S")
        fh = logging.FileHandler(Path(log_dir) / f"{name}_{ts}.log")
        fh.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
        logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger


# ---------------------------------------------------------------------------
# timers: compile vs execute split (SURVEY §5.1 requirement)
# ---------------------------------------------------------------------------


@dataclass
class TimedRun:
    compile_s: float
    execute_s: float
    result: object


def timed_jit_call(fn: Callable, *args, reps: int = 1) -> TimedRun:
    """First call (compile+run) vs median warm execution time."""
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        walls.append(time.time() - t0)
    return TimedRun(compile_s=compile_s - float(np.median(walls)),
                    execute_s=float(np.median(walls)), result=out)


@contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace hook around a region (view in TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# ---------------------------------------------------------------------------
# NaN diagnosis (reference debug_jacobian, main/control/quad_control.py:11-112)
# ---------------------------------------------------------------------------


def locate_nan_in_jacobian(step_fn: Callable, x: jax.Array, u: jax.Array) -> dict:
    """Pinpoint which state/control rows/columns of the discrete-step
    Jacobians contain non-finite entries at (x, u)."""
    A = np.asarray(jax.jacfwd(lambda xx: step_fn(xx, u))(x))
    B = np.asarray(jax.jacfwd(lambda uu: step_fn(x, uu))(u))
    bad_A = np.argwhere(~np.isfinite(A))
    bad_B = np.argwhere(~np.isfinite(B))
    return {
        "A_bad_entries": bad_A.tolist(),
        "B_bad_entries": bad_B.tolist(),
        "A_bad_rows": sorted(set(int(r) for r, _ in bad_A)),
        "B_bad_rows": sorted(set(int(r) for r, _ in bad_B)),
        "x_nonfinite": np.argwhere(~np.isfinite(np.asarray(x))).flatten().tolist(),
        "u_nonfinite": np.argwhere(~np.isfinite(np.asarray(u))).flatten().tolist(),
    }


# ---------------------------------------------------------------------------
# Finite-difference Jacobian cross-check (reference main/stability/trim.py
# :139-215 offers finite_differences=True wrappers to validate the CasADi AD
# path; here the AD under test is jax.jacfwd/jacrev)
# ---------------------------------------------------------------------------


def fd_jacobian(fn: Callable, x: jax.Array, eps: float = 1e-4) -> np.ndarray:
    """Central-difference Jacobian of ``fn`` at ``x`` (host-side oracle)."""
    x = np.asarray(x, dtype=np.float64)
    f0 = np.asarray(fn(jnp.asarray(x, dtype=jnp.float32)), dtype=np.float64)
    J = np.zeros(f0.shape + x.shape, dtype=np.float64)
    for i in range(x.size):
        dx = np.zeros_like(x)
        dx.flat[i] = eps
        fp = np.asarray(fn(jnp.asarray(x + dx, dtype=jnp.float32)))
        fm = np.asarray(fn(jnp.asarray(x - dx, dtype=jnp.float32)))
        J[..., i] = (fp - fm) / (2 * eps)
    return J


def check_jacobian(fn: Callable, x: jax.Array, eps: float = 1e-4,
                   rtol: float = 5e-2, atol: float = 1e-3) -> dict:
    """Compare jacfwd(fn) against the finite-difference oracle; returns a
    report dict with the max absolute/relative deviation and a pass flag."""
    J_ad = np.asarray(jax.jacfwd(fn)(jnp.asarray(x, dtype=jnp.float32)),
                      dtype=np.float64)
    J_fd = fd_jacobian(fn, x, eps)
    abs_err = np.abs(J_ad - J_fd)
    denom = np.maximum(np.abs(J_fd), 1.0)
    rel_err = abs_err / denom
    return {
        "max_abs_err": float(abs_err.max()),
        "max_rel_err": float(rel_err.max()),
        "ok": bool(np.all(abs_err <= atol + rtol * denom)),
        "worst_entry": [int(i) for i in
                        np.unravel_index(abs_err.argmax(), abs_err.shape)],
    }
