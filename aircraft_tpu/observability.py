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
# per-solve diagnostics (reference AircraftControl.log,
# control/aircraft.py:81-147: Jacobian condition numbers, dynamics-defect
# violations, active constraint sets WITH duals, saturation flags)
# ---------------------------------------------------------------------------


def diagnose(sol, ocp, *, registry: Optional["ConstraintRegistry"] = None,
             params=None, top_k: int = 8, active_tol: float = 1e-6) -> dict:
    """Host-side post-mortem of one finished ILQRSolution — the exact tool
    for a window solve stalled at the envelope floor.  Reports:

      * active stage-inequality set with the AL dual estimates λ
        (``sol.al.lam_ineq``), rows mapped through ``registry`` when given,
      * worst violated rows over the horizon (value, knot, dual),
      * per-knot Quu condition numbers from a Gauss-Newton Riccati replay
        (the reference logged Jacobian condition numbers, :96-107),
      * worst-knot dynamics defect ‖x_{k+1} − F(x_k, u_k)‖∞ (≈0 by
        construction for single shooting — a non-zero value means the
        solution arrays were edited after the solve),
      * control-saturation flags per channel,
      * airspeed/α/β envelope traces when ``params`` is given.

    Strictly off the hot path: numpy + small re-traced evaluations, never
    inside jit.
    """
    from aircraft_tpu.solvers import ocp as ocp_mod

    xs = np.asarray(sol.xs)
    us = np.asarray(sol.us)
    N, m = us.shape
    ks = jnp.arange(N)

    g = np.asarray(jax.vmap(lambda x, u, k: ocp.ineq(x, u, k))(
        jnp.asarray(xs[:-1]), jnp.asarray(us), ks))          # (N, n_ineq)
    h = np.asarray(jax.vmap(lambda x, u, k: ocp.eq(x, u, k))(
        jnp.asarray(xs[:-1]), jnp.asarray(us), ks))          # (N, n_eq)

    al = getattr(sol, "al", None)
    lam_ineq = np.asarray(al.lam_ineq) if al is not None else np.zeros_like(g)
    mu = float(np.asarray(al.mu)) if al is not None else float("nan")

    # active set: rows the AL currently prices (g + λ/μ > 0 — the PHR
    # activity test the solver itself uses) plus anything near the boundary
    act = g > -active_tol
    if al is not None and np.isfinite(mu) and mu > 0:
        act |= (g + lam_ineq / mu) > 0.0
    active_rows = []
    for j in np.unique(np.nonzero(act)[1]):
        knots = np.nonzero(act[:, j])[0]
        active_rows.append({
            "row": int(j),
            "name": registry.describe(int(j)) if registry else f"ineq[{j}]",
            "n_knots_active": int(knots.size),
            "first_knot": int(knots[0]),
            "worst_value": float(g[:, j].max()),
            "worst_knot": int(g[:, j].argmax()),
            "max_dual": float(lam_ineq[:, j].max()),
        })
    active_rows.sort(key=lambda r: -r["worst_value"])

    # worst violations over the horizon, named
    flat = g.ravel()
    order = np.argsort(flat)[::-1][:top_k]
    worst = []
    for idx in order:
        if flat[idx] <= 0:
            break
        k_i, j_i = np.unravel_index(idx, g.shape)
        worst.append({
            "name": registry.describe(int(j_i)) if registry else f"ineq[{j_i}]",
            "knot": int(k_i),
            "value": float(flat[idx]),
            "dual": float(lam_ineq[k_i, j_i]),
        })

    # dynamics defects (reference logged violations > 1e-3, :109-114)
    step_next = np.asarray(jax.vmap(lambda x, u, k: ocp.step(x, u, k))(
        jnp.asarray(xs[:-1]), jnp.asarray(us), ks))
    defect = np.abs(xs[1:] - step_next).max(axis=-1)         # (N,)

    # Quu conditioning: Gauss-Newton Riccati replay at the solution
    quu_cond = None
    if al is not None:
        try:
            from aircraft_tpu.solvers.ilqr import _quadraticize_gn

            def jac(x, u, k):
                A = jax.jacfwd(lambda xx: ocp.step(xx, u, k))(x)
                B = jax.jacfwd(lambda uu: ocp.step(x, uu, k))(u)
                return A, B

            A, B = jax.vmap(jac)(jnp.asarray(xs[:-1]), jnp.asarray(us), ks)
            _, _, lxx, luu, lux, _, vxx = _quadraticize_gn(
                ocp, al, jnp.asarray(xs), jnp.asarray(us))
            A, B = np.asarray(A, np.float64), np.asarray(B, np.float64)
            luu, vxx = np.asarray(luu, np.float64), np.asarray(vxx, np.float64)
            lxx, lux = np.asarray(lxx, np.float64), np.asarray(lux, np.float64)
            Vxx = vxx
            conds = np.zeros(N)
            for k in range(N - 1, -1, -1):
                Quu = luu[k] + B[k].T @ Vxx @ B[k]
                Qxx = lxx[k] + A[k].T @ Vxx @ A[k]
                Qux = lux[k] + B[k].T @ Vxx @ A[k]
                w = np.linalg.eigvalsh(0.5 * (Quu + Quu.T))
                conds[k] = float(w[-1] / max(w[0], 1e-30)) if w[0] > 0 else np.inf
                K = np.linalg.solve(Quu + 1e-9 * np.eye(m), Qux)
                Vxx = Qxx - Qux.T @ K
                Vxx = 0.5 * (Vxx + Vxx.T)
            quu_cond = {
                "max": float(np.nanmax(conds)),
                "worst_knot": int(np.nanargmax(conds)),
                "median": float(np.nanmedian(conds)),
                "n_indefinite": int(np.sum(~np.isfinite(conds))),
            }
        except Exception as e:  # diagnostics must never take the solve down
            quu_cond = {"error": repr(e)}

    report = {
        "cost": float(np.asarray(sol.cost)),
        "violation": float(np.asarray(sol.violation)),
        "converged": bool(np.asarray(sol.converged)),
        "iterations": int(np.asarray(sol.iterations)),
        "mu": mu,
        "active_constraints": active_rows[:top_k],
        "worst_violations": worst,
        "eq_violation_max": float(np.abs(h).max()) if h.size else 0.0,
        "worst_defect": float(defect.max()),
        "worst_defect_knot": int(defect.argmax()),
        "quu_cond": quu_cond,
        "nonfinite_states": int((~np.isfinite(xs)).sum()),
    }
    if params is not None:
        from aircraft_tpu.dynamics import aircraft as _ac

        n_x = min(xs.shape[1], 13)
        aero = jax.vmap(lambda x, u: _ac.aero_state(
            params, x[:13], u[:7]))(jnp.asarray(xs[:-1]), jnp.asarray(us))
        speed = np.sqrt(np.asarray(2.0 * aero.qbar / 1.225))
        report["envelope_traces"] = {
            "airspeed_min": float(speed.min()),
            "airspeed_max": float(speed.max()),
            "alpha_deg_max": float(np.rad2deg(np.abs(np.asarray(aero.alpha)).max())),
            "beta_deg_max": float(np.rad2deg(np.abs(np.asarray(aero.beta)).max())),
        }
        del n_x
    return report


def format_diagnosis(report: dict) -> str:
    """Human-readable rendering of a `diagnose` report (the reference's
    file-log format, control/aircraft.py:81-147)."""
    lines = [
        f"solve: cost={report['cost']:.3f} violation={report['violation']:.3e} "
        f"converged={report['converged']} iters={report['iterations']} "
        f"mu={report['mu']:.1e}",
        f"defect: max {report['worst_defect']:.2e} at knot "
        f"{report['worst_defect_knot']}; eq viol {report['eq_violation_max']:.2e}",
    ]
    if report.get("quu_cond") and "max" in report.get("quu_cond", {}):
        q = report["quu_cond"]
        lines.append(
            f"Quu cond: max {q['max']:.2e} (knot {q['worst_knot']}), "
            f"median {q['median']:.2e}, indefinite knots {q['n_indefinite']}"
        )
    if report.get("envelope_traces"):
        t = report["envelope_traces"]
        lines.append(
            f"envelope: v in [{t['airspeed_min']:.1f}, {t['airspeed_max']:.1f}] m/s, "
            f"|alpha| <= {t['alpha_deg_max']:.1f} deg, |beta| <= {t['beta_deg_max']:.1f} deg"
        )
    if report["active_constraints"]:
        lines.append("active constraints (worst first):")
        for r in report["active_constraints"]:
            lines.append(
                f"  {r['name']}: {r['n_knots_active']} knots from "
                f"{r['first_knot']}, worst {r['worst_value']:+.3e} at knot "
                f"{r['worst_knot']}, dual {r['max_dual']:.2e}"
            )
    if report["worst_violations"]:
        lines.append("worst violations:")
        for r in report["worst_violations"]:
            lines.append(
                f"  {r['name']} at knot {r['knot']}: {r['value']:.3e} "
                f"(dual {r['dual']:.2e})"
            )
    return "\n".join(lines)


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
