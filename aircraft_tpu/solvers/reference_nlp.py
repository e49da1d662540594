"""Host-side direct multiple-shooting NLP oracle (the IPOPT stand-in).

The reference validates every formulation by handing a direct
multiple-shooting transcription to IPOPT (reference control/base.py:423-477
builds the ``ca.Opti`` NLP; config.py:23-54 the solver options).  IPOPT and
CasADi are not components of the TPU framework, so solution parity is
checked the only way that is actually meaningful: against an INDEPENDENT
NLP solver running the SAME transcription.  scipy's SLSQP (a dense
sequential-quadratic-programming method, the same algorithmic family as
IPOPT's barrier-SQP) plays that role here.

Transcription (mirrors reference control/base.py:339-443):
  * decision vector  z = [x_1 … x_N | u_0 … u_{N-1}]  (x_0 pinned),
  * dynamics defects x_{k+1} − F(x_k, u_k, dt) = 0 as equalities
    (reference base.py:275-286),
  * the OCP's stage/terminal equalities and inequalities at every knot,
  * objective = Σ stage_cost + terminal_cost.

Derivatives come from JAX (grad / jacrev of the packed functions), so the
oracle exercises the very same problem callables the AL-iLQR solves —
only the ALGORITHM is independent.  The whole solve runs inside a
`jax.enable_x64()` scope: the float32 problem constants promote against
the float64 decision vector, giving scipy full-precision values and
gradients (SLSQP stalls on float32 gradients).  Host-side only — tests
and parity harnesses, never the device hot path.

This is SURVEY §7 hard part 2 ("matching IPOPT solutions") made concrete:
`tests/test_reference_nlp.py` asserts both solvers reach the same
stationary point on the reference's own problem shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.solvers import ocp as ocp_mod
from aircraft_tpu.solvers.ocp import OCPFunctions


@dataclass
class NLPSolution:
    """Result of a host-side reference NLP solve."""

    xs: np.ndarray          # (N+1, n_x) including the pinned x0
    us: np.ndarray          # (N, n_u)
    cost: float             # true (un-augmented) objective
    violation: float        # max |eq| / positive ineq over the trajectory
    success: bool
    message: str
    nit: int


def _pack(xs_tail: np.ndarray, us: np.ndarray) -> np.ndarray:
    return np.concatenate([xs_tail.ravel(), us.ravel()]).astype(np.float64)


def solve_reference_nlp(
    ocp: OCPFunctions,
    x0,
    us_init,
    *,
    xs_init: Optional[np.ndarray] = None,
    method: str = "SLSQP",
    maxiter: int = 400,
    ftol: float = 1e-12,
) -> NLPSolution:
    """Solve the OCP's multiple-shooting NLP with scipy (host, dense).

    ``xs_init`` defaults to the forward rollout of ``us_init`` (the
    reference's `initialise` warm start, main/control/control.py:72-93).
    Intended for SMALL horizons (N ≲ 60) — the constraint Jacobian is
    dense (N·n_x × N·(n_x+n_u)).
    """
    from scipy.optimize import minimize

    with jax.enable_x64():
        x0 = jnp.asarray(np.asarray(x0), dtype=jnp.float64)
        us_init = jnp.asarray(np.asarray(us_init), dtype=jnp.float64)
        N, n_u = us_init.shape
        n_x = x0.shape[0]

        if xs_init is None:
            def _roll(carry, ku):
                k, u = ku
                nxt = ocp.step(carry, u, k)
                return nxt, nxt
            _, xs_tail = jax.lax.scan(_roll, x0, (jnp.arange(N), us_init))
            xs_init = np.asarray(xs_tail, dtype=np.float64)
        else:
            xs_init = np.asarray(xs_init, dtype=np.float64)
            if xs_init.shape[0] == N + 1:
                xs_init = xs_init[1:]

        ks = jnp.arange(N)

        def unpack(z):
            xs_tail = z[: N * n_x].reshape(N, n_x)
            us = z[N * n_x :].reshape(N, n_u)
            xs = jnp.concatenate([x0[None], xs_tail], axis=0)
            return xs, us

        def objective(z):
            xs, us = unpack(z)
            return ocp_mod.true_cost(ocp, xs, us)

        def eq_vec(z):
            xs, us = unpack(z)
            defects = jax.vmap(lambda k: xs[k + 1] - ocp.step(xs[k], us[k], k))(ks)
            stage_eq = jax.vmap(lambda k: ocp.eq(xs[k], us[k], k))(ks)
            return jnp.concatenate(
                [defects.ravel(), stage_eq.ravel(), ocp.terminal_eq(xs[-1]).ravel()]
            )

        def ineq_vec(z):
            # scipy convention: feasible iff fun(z) >= 0, ours is g <= 0
            xs, us = unpack(z)
            stage = jax.vmap(lambda k: ocp.ineq(xs[k], us[k], k))(ks)
            return -jnp.concatenate(
                [stage.ravel(), ocp.terminal_ineq(xs[-1]).ravel()]
            )

        obj_vg = jax.jit(jax.value_and_grad(objective))
        eq_f = jax.jit(eq_vec)
        eq_j = jax.jit(jax.jacrev(eq_vec))
        ineq_f = jax.jit(ineq_vec)
        ineq_j = jax.jit(jax.jacrev(ineq_vec))

        def np_obj(z):
            v, g = obj_vg(jnp.asarray(z))
            return float(v), np.asarray(g, dtype=np.float64)

        constraints = [
            {
                "type": "eq",
                "fun": lambda z: np.asarray(eq_f(jnp.asarray(z)), np.float64),
                "jac": lambda z: np.asarray(eq_j(jnp.asarray(z)), np.float64),
            }
        ]
        n_ineq = int(ineq_f(jnp.zeros(N * (n_x + n_u))).shape[0])
        if n_ineq:
            constraints.append(
                {
                    "type": "ineq",
                    "fun": lambda z: np.asarray(ineq_f(jnp.asarray(z)), np.float64),
                    "jac": lambda z: np.asarray(ineq_j(jnp.asarray(z)), np.float64),
                }
            )

        z0 = _pack(xs_init, np.asarray(us_init, np.float64))
        res = minimize(
            np_obj,
            z0,
            jac=True,
            method=method,
            constraints=constraints,
            options={"maxiter": maxiter, "ftol": ftol},
        )

        xs, us = unpack(jnp.asarray(res.x))
        viol = float(ocp_mod.max_violation(ocp, xs, us))
        # the defect violations are not in max_violation (the iLQR
        # satisfies them by construction) — fold them in for the NLP iterate
        viol = max(viol, float(jnp.max(jnp.abs(eq_f(jnp.asarray(res.x))))))
        return NLPSolution(
            xs=np.asarray(xs, np.float64),
            us=np.asarray(us, np.float64),
            cost=float(ocp_mod.true_cost(ocp, xs, us)),
            violation=viol,
            success=bool(res.success),
            message=str(res.message),
            nit=int(getattr(res, "nit", -1)),
        )
