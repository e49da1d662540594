"""Trajectory rollouts and linearisation.

The reference's hot loop calls one CasADi VM invocation per step (reference
main/dynamics/dynamics.py:105-130); here the whole horizon is a single
`lax.scan` compiled into one XLA program, and batches of scenarios are
`vmap`-ed so thousands of rollouts share the device.

Linearisation replaces CasADi's AD: per-knot (A, B) Jacobians come from
`jax.jacfwd` of the discrete step and are vmapped along the horizon.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def rollout(step_fn: Callable, x0: jax.Array, us: jax.Array, dt) -> jax.Array:
    """Open-loop rollout: x_{k+1} = step(x_k, u_k, dt_k).

    Args:
      step_fn: `(x, u, dt) -> x_next` (see integrators.make_step_fn).
      x0: initial state (state_dim,).
      us: control trajectory (N, control_dim).
      dt: scalar or per-knot (N,) timestep.

    Returns:
      states (N + 1, state_dim), including x0.
    """
    N = us.shape[0]
    dts = jnp.broadcast_to(jnp.asarray(dt, dtype=x0.dtype), (N,))

    def body(x, inp):
        u, dt_k = inp
        x_next = step_fn(x, u, dt_k)
        return x_next, x_next

    _, xs = jax.lax.scan(body, x0, (us, dts))
    return jnp.concatenate([x0[None], xs], axis=0)


def closed_loop_rollout(
    step_fn: Callable,
    x0: jax.Array,
    us_ref: jax.Array,
    xs_ref: jax.Array,
    gains: jax.Array,
    dt,
    alpha: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Feedback rollout used by the iLQR forward pass:
    u_k = u_ref_k + α k_k + K_k (x_k − x_ref_k)."""
    N = us_ref.shape[0]
    dts = jnp.broadcast_to(jnp.asarray(dt, dtype=x0.dtype), (N,))
    K, k = gains

    def body(x, inp):
        u_ref, x_ref, K_k, k_k, dt_k = inp
        u = u_ref + alpha * k_k + K_k @ (x - x_ref)
        x_next = step_fn(x, u, dt_k)
        return x_next, (x_next, u)

    _, (xs, us) = jax.lax.scan(body, x0, (us_ref, xs_ref[:-1], K, k, dts))
    return jnp.concatenate([x0[None], xs], axis=0), us


def linearize_along(
    step_fn: Callable, xs: jax.Array, us: jax.Array, dt
) -> tuple[jax.Array, jax.Array]:
    """Per-knot discrete Jacobians A_k = ∂step/∂x, B_k = ∂step/∂u along a
    trajectory. Forward-mode: state/control dims are small (13/7), so jacfwd
    over the 20 tangents beats reverse-mode here. Returns (N, n, n), (N, n, m).
    """
    N = us.shape[0]
    dts = jnp.broadcast_to(jnp.asarray(dt, dtype=xs.dtype), (N,))

    def jac(x, u, dt_k):
        A = jax.jacfwd(lambda xx: step_fn(xx, u, dt_k))(x)
        B = jax.jacfwd(lambda uu: step_fn(x, uu, dt_k))(u)
        return A, B

    return jax.vmap(jac)(xs[:-1], us, dts)


def batch_rollout(step_fn: Callable, x0s: jax.Array, uss: jax.Array, dt) -> jax.Array:
    """vmap of `rollout` over a scenario batch: (B, n), (B, N, m) -> (B, N+1, n)."""
    return jax.vmap(lambda x0, us: rollout(step_fn, x0, us, dt))(x0s, uss)
