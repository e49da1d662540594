"""Infinite-horizon LQR about a trim point, on the error-state manifold.

Covers the reference's experimental LQR wrapper (reference
src/aircraft/dynamics/base.py:41-76: scipy CARE on the raw 13-state
Jacobian).  The raw-state formulation is structurally broken for a
quaternion plant — the unit-norm direction is an uncontrollable neutral
mode that the (D)ARE cannot stabilise — so the TPU-native design works in
the 12-dimensional tangent space instead:

    xi = [dp, dv, dtheta, domega],   q = exp(dtheta) (x) q_ref

The error-step map is linearised with one `jax.jacfwd` (A: 12x12,
B: 12xn_u), and the discrete Riccati equation is solved by a
fixed-trip-count structure-preserving doubling iteration — jittable,
batchable over operating points, no data-dependent control flow.
A host-side scipy CARE path is kept for reference parity.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.dynamics import base
from aircraft_tpu.ops import quaternion as quat
from aircraft_tpu.solvers import integrators

TANGENT_DIM = 12


# ---------------------------------------------------------------------------
# error-state chart
# ---------------------------------------------------------------------------


def inject(x_ref: jax.Array, xi: jax.Array) -> jax.Array:
    """x = x_ref (+) xi: apply a tangent-space error to a reference state.
    The attitude block perturbs multiplicatively, q = exp(dtheta) (x) q_ref,
    so the result is a unit quaternion by construction."""
    p = x_ref[..., base.POS] + xi[..., 0:3]
    v = x_ref[..., base.VEL] + xi[..., 3:6]
    q = quat.multiply(quat.expmap(xi[..., 6:9]), x_ref[..., base.QUAT])
    om = x_ref[..., base.OMEGA] + xi[..., 9:12]
    return base.pack_state(p, v, q, om)


def retract(x: jax.Array, x_ref: jax.Array) -> jax.Array:
    """xi = x (-) x_ref: tangent-space error between two states."""
    dq = quat.multiply(x[..., base.QUAT], quat.inverse(x_ref[..., base.QUAT]))
    return jnp.concatenate(
        [
            x[..., base.POS] - x_ref[..., base.POS],
            x[..., base.VEL] - x_ref[..., base.VEL],
            quat.logmap(dq),
            x[..., base.OMEGA] - x_ref[..., base.OMEGA],
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# linearisation + Riccati
# ---------------------------------------------------------------------------


def error_jacobians(params, x_ref: jax.Array, u_ref: jax.Array, dt,
                    substeps: int = 1):
    """A (12x12), B (12xn_u) of the discrete error-step map
    xi+ = F(x_ref (+) xi, u_ref + du) (-) F(x_ref, u_ref), at xi = du = 0."""

    def step(x, u):
        return integrators.step(params, x, u, dt, substeps=substeps,
                                normalize="step")

    x_next_ref = step(x_ref, u_ref)

    def err_step(xi, du):
        return retract(step(inject(x_ref, xi), u_ref + du), x_next_ref)

    zero_xi = jnp.zeros(TANGENT_DIM, dtype=x_ref.dtype)
    zero_du = jnp.zeros_like(u_ref)
    A = jax.jacfwd(lambda xi: err_step(xi, zero_du))(zero_xi)
    B = jax.jacfwd(lambda du: err_step(zero_xi, du))(zero_du)
    return A, B


def solve_dare(A: jax.Array, B: jax.Array, Q: jax.Array, R: jax.Array,
               iters: int = 60) -> jax.Array:
    """Discrete algebraic Riccati equation by the structure-preserving
    doubling algorithm (SDA): quadratic convergence, fixed trip count, all
    dense small-matrix ops — MXU-friendly and batchable under vmap.

    Iteration (Chu et al.):  with A0 = A, G0 = B R^-1 B^T, H0 = Q,
        A_{k+1} = A_k (I + G_k H_k)^-1 A_k
        G_{k+1} = G_k + A_k (I + G_k H_k)^-1 G_k A_k^T
        H_{k+1} = H_k + A_k^T H_k (I + G_k H_k)^-1 A_k
    H_k -> P quadratically; ~20 doublings give machine precision, 60 is
    pure safety margin (still microseconds at n=12).
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    G0 = B @ jnp.linalg.solve(R, B.T)

    def body(carry, _):
        Ak, Gk, Hk = carry
        W = eye + Gk @ Hk
        WinvA = jnp.linalg.solve(W, Ak)       # W^-1 A_k
        WinvG = jnp.linalg.solve(W, Gk)       # W^-1 G_k
        A_next = Ak @ WinvA
        G_next = Gk + Ak @ WinvG @ Ak.T
        H_next = Hk + Ak.T @ Hk @ WinvA
        return (A_next, G_next, H_next), None

    (_, _, P), _ = jax.lax.scan(body, (A, G0, Q), None, length=iters)
    return 0.5 * (P + P.T)


def dare_gain(A: jax.Array, B: jax.Array, Q: jax.Array, R: jax.Array,
              iters: int = 60) -> tuple[jax.Array, jax.Array]:
    """(K, P): u = -K xi minimises the infinite-horizon discrete cost."""
    P = solve_dare(A, B, Q, R, iters)
    K = jnp.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
    return K, P


def continuous_lqr(A: np.ndarray, B: np.ndarray, Q: np.ndarray,
                   R: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side continuous-time LQR via scipy CARE — the reference-parity
    path (reference dynamics/base.py:60-66 calls
    scipy.linalg.solve_continuous_are)."""
    from scipy.linalg import solve_continuous_are

    P = solve_continuous_are(A, B, Q, R)
    K = np.linalg.solve(R, B.T @ P)
    return K, P


# ---------------------------------------------------------------------------
# controller assembly
# ---------------------------------------------------------------------------


class LQRController(NamedTuple):
    x_ref: jax.Array
    u_ref: jax.Array
    K: jax.Array      # (n_u, 12)
    P: jax.Array      # (12, 12) value matrix (doubles as terminal-cost seed)
    A: jax.Array
    B: jax.Array


def design(params, x_ref: jax.Array, u_ref: jax.Array, dt: float,
           Q=None, R=None, substeps: int = 1) -> LQRController:
    """Design an error-state LQR about (x_ref, u_ref).  Defaults weight
    velocity/attitude/rate errors and leave position loose (station-keeping
    of an unpowered glider is not achievable; attitude hold is)."""
    nu = u_ref.shape[-1]
    if Q is None:
        Q = jnp.diag(jnp.asarray(
            [0.0, 0.0, 0.0,        # position: free (glider cannot hold it)
             1.0, 1.0, 1.0,        # velocity
             50.0, 50.0, 50.0,     # attitude
             5.0, 5.0, 5.0],       # body rates
            dtype=x_ref.dtype))
    if R is None:
        R = jnp.eye(nu, dtype=x_ref.dtype)
    A, B = error_jacobians(params, x_ref, u_ref, dt, substeps=substeps)
    K, P = dare_gain(A, B, jnp.asarray(Q), jnp.asarray(R))
    return LQRController(x_ref=x_ref, u_ref=u_ref, K=K, P=P, A=A, B=B)


def control(ctrl: LQRController, x: jax.Array) -> jax.Array:
    """u = u_ref - K (x (-) x_ref); broadcasts over batch axes of x."""
    xi = retract(x, ctrl.x_ref)
    return ctrl.u_ref - xi @ ctrl.K.T


def closed_loop_step(params, ctrl: LQRController, dt: float,
                     substeps: int = 1) -> Callable:
    """One-step closed-loop map x -> F(x, lqr(x)) for lax.scan rollouts.
    NOTE: regulates to the FIXED point (x_ref, u_ref); for tracking a trim
    trajectory, advance x_ref alongside (see tests)."""

    def step(x, _):
        u = control(ctrl, x)
        x_next = integrators.step(params, x, u, dt, substeps=substeps,
                                  normalize="step")
        return x_next, x_next

    return step
