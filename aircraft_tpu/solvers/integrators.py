"""Fixed-step integrators for the 6-DoF plants.

The reference hand-rolls RK4 and folds substeps with `ca.Function.fold`
(reference dynamics/base.py:408-480); the TPU-native equivalents are a pure
RK4 step and a `lax.scan` over substeps — one compiled loop body, unrolled
and fused by XLA, identical cost per substep.

Quaternion-norm strategies (the reference ablates four — SURVEY §7 hard
part 5):
  * ``normalize="none"``      leave drift to the transcription constraints
  * ``normalize="step"``      renormalise after every (sub)step
                              (reference `SixDOF.normalise`)
  * ``normalize="expmap"``    replace the quaternion block update with the
                              exact exponential map (norm-preserving by
                              construction; reference base.py:317-342)
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from aircraft_tpu.dynamics import base
from aircraft_tpu.dynamics.base import QUAT, OMEGA
from aircraft_tpu.ops import quaternion as quat

NORMALIZE_MODES = ("none", "step", "expmap")


def rk4_step(f: Callable, x: jax.Array, u: jax.Array, dt) -> jax.Array:
    """Classic RK4 with zero-order-hold control (reference base.py:408-446).

    `dt` may be a scalar or carry batch axes; `[..., None]` broadcasts it
    against the trailing state axis either way.
    """
    dt = jnp.asarray(dt, dtype=x.dtype)[..., None]
    half = 0.5 * dt
    k1 = f(x, u)
    k2 = f(x + half * k1, u)
    k3 = f(x + half * k2, u)
    k4 = f(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def _apply_norm_mode(x_next: jax.Array, x_prev: jax.Array, u, dt, normalize: str):
    if normalize == "none":
        return x_next
    if normalize == "step":
        return base.normalize_quaternion_state(x_next)
    if normalize == "expmap":
        # integrate the quaternion block exactly on SO(3) using the midpoint
        # body rate of the RK4 state update
        omega_mid = 0.5 * (x_prev[..., OMEGA] + x_next[..., OMEGA])
        q_next = quat.integrate_expmap(x_prev[..., QUAT], omega_mid, dt)
        return jnp.concatenate(
            [x_next[..., :6], q_next, x_next[..., OMEGA]], axis=-1
        )
    raise ValueError(f"normalize must be one of {NORMALIZE_MODES}, got {normalize}")


def step(
    params,
    x: jax.Array,
    u: jax.Array,
    dt,
    *,
    substeps: int = 1,
    normalize: str = "none",
    derivative_fn: Callable | None = None,
) -> jax.Array:
    """One control interval: `substeps` RK4 steps of dt/substeps each
    (replaces `state_update` + `Function.fold`, reference base.py:450-480).

    Broadcasts over leading batch axes of x/u/dt; `substeps` and `normalize`
    are static.
    """
    f = derivative_fn if derivative_fn is not None else partial(base.state_derivative, params)
    dt = jnp.asarray(dt, dtype=x.dtype)

    def substep(x_i, _):
        dt_i = dt / substeps
        x_next = rk4_step(f, x_i, u, dt_i)
        x_next = _apply_norm_mode(x_next, x_i, u, dt_i, normalize)
        return x_next, None

    if substeps == 1:
        x_out, _ = substep(x, None)
        return x_out
    x_out, _ = jax.lax.scan(substep, x, None, length=substeps)
    return x_out


def implicit_euler_step(
    f: Callable,
    x: jax.Array,
    u: jax.Array,
    dt,
    *,
    newton_iters: int = 3,
) -> jax.Array:
    """Implicit Euler x⁺ = x + dt f(x⁺, u), solved by a fixed number of
    full Newton iterations on g(y) = y − x − dt·f(y, u).

    The reference exposes this as the transcription's 'implicit' defect mode
    (reference control/base.py:282-284); in single-shooting form the
    implicit solve moves inside the step.  Newton (not fixed-point) matters:
    the glider's rotational dynamics have |eigenvalues| up to ~100 s⁻¹, so
    the plain fixed-point iteration x⁺ ← x + dt·f(x⁺) diverges whenever
    dt ≳ 0.01 — measured in the round-2 ablation corpus as every implicit
    case freezing at its initial state ("feasible, pinf=0, goal 120 m"
    rows: the diverging inner iteration tripped the rollout freeze guard at
    every knot).  The 13×13 Jacobian solve per iteration is cheap and
    A-stability is the entire point of the implicit mode.  Fixed trip count
    keeps it jit/vmap-friendly.
    """
    dt = jnp.asarray(dt, dtype=x.dtype)
    eye = jnp.eye(x.shape[-1], dtype=x.dtype)
    x_next = x + dt * f(x, u)  # explicit predictor
    for _ in range(newton_iters):
        g = x_next - x - dt * f(x_next, u)
        J = eye - dt * jax.jacfwd(lambda yy: f(yy, u))(x_next)
        x_next = x_next - jnp.linalg.solve(J, g)
    return x_next


def step_implicit(
    params,
    x: jax.Array,
    u: jax.Array,
    dt,
    *,
    substeps: int = 1,
    normalize: str = "none",
    derivative_fn: Callable | None = None,
    newton_iters: int = 3,
) -> jax.Array:
    """Implicit-Euler control interval with substeps (mirror of `step`)."""
    f = derivative_fn if derivative_fn is not None else partial(base.state_derivative, params)
    dt = jnp.asarray(dt, dtype=x.dtype)

    def substep(x_i, _):
        dt_i = dt / substeps
        x_next = implicit_euler_step(f, x_i, u, dt_i, newton_iters=newton_iters)
        x_next = _apply_norm_mode(x_next, x_i, u, dt_i, normalize)
        return x_next, None

    if substeps == 1:
        x_out, _ = substep(x, None)
        return x_out
    x_out, _ = jax.lax.scan(substep, x, None, length=substeps)
    return x_out


def make_step_fn(
    params,
    *,
    substeps: int = 1,
    normalize: str = "none",
    derivative_fn: Callable | None = None,
    integration: str = "explicit",
) -> Callable:
    """Bind integrator options; returns `step(x, u, dt) -> x_next`.

    `integration` follows the reference option axis
    (control/base.py:278-286): 'explicit' = RK4, 'implicit' = implicit
    Euler with an internal Newton fixed point.
    """
    if integration == "implicit":
        def fn(x, u, dt):
            return step_implicit(
                params, x, u, dt,
                substeps=substeps, normalize=normalize,
                derivative_fn=derivative_fn,
            )
    else:
        def fn(x, u, dt):
            return step(
                params, x, u, dt,
                substeps=substeps, normalize=normalize,
                derivative_fn=derivative_fn,
            )

    return fn
