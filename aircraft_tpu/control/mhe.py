"""Moving-horizon estimation: wind (and state) estimation from a window of
measurements.

BASELINE config 4 pairs the receding-horizon controller with moving-horizon
estimation under wind disturbance.  The reference's `main/mhe/` folder only
contains the tracking controller; this module supplies the estimator
proper: given the last W measured states and applied controls, find the
constant wind vector (and optionally a corrected initial state) whose
predicted trajectory best explains the measurements — a small Gauss–Newton
least-squares over the same dynamics kernels, jitted and batchable.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from aircraft_tpu.dynamics import aircraft as ac
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.solvers import integrators


class MHEResult(NamedTuple):
    wind: jax.Array        # (3,) estimated NED wind
    residual: jax.Array    # RMS one-step prediction error at the optimum
    converged: jax.Array


@partial(jax.jit, static_argnums=(4, 5))
def estimate_wind(
    params: AircraftParams,
    xs_meas: jax.Array,    # (W+1, 13) measured states
    us: jax.Array,         # (W, 7) applied controls
    dt: jax.Array,
    substeps: int = 1,
    iters: int = 8,
) -> MHEResult:
    """Gauss–Newton fit of a constant wind to one-step prediction residuals.

    Each window step predicts x̂_{k+1} = f(x_k^meas, u_k; wind) and the
    residual stacks the velocity/rate components (positions are integrals —
    velocity errors carry the wind signal).
    """

    def step_with_wind(x, u, wind):
        deriv = lambda xx, uu: ac.state_derivative(params, xx, uu, wind=wind)
        return integrators.step(
            params, x, u, dt, substeps=substeps, normalize="step",
            derivative_fn=deriv,
        )

    def residuals(wind):
        pred = jax.vmap(lambda x, u: step_with_wind(x, u, wind))(xs_meas[:-1], us)
        err = pred[:, 3:6] - xs_meas[1:, 3:6]          # velocity residuals
        err_w = pred[:, 10:13] - xs_meas[1:, 10:13]    # rate residuals
        return jnp.concatenate([err, err_w], axis=-1).reshape(-1)

    def gn_step(carry, _):
        wind, lam = carry
        r = residuals(wind)
        J = jax.jacfwd(residuals)(wind)
        H = J.T @ J + lam * jnp.eye(3, dtype=wind.dtype)
        dw = -jnp.linalg.solve(H, J.T @ r)
        wind_new = wind + dw
        improved = jnp.sum(residuals(wind_new) ** 2) < jnp.sum(r * r)
        wind = jnp.where(improved, wind_new, wind)
        lam = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-8), lam * 4.0)
        return (wind, lam), None

    w0 = jnp.zeros(3, dtype=xs_meas.dtype)
    (wind, _), _ = jax.lax.scan(
        gn_step, (w0, jnp.asarray(1e-4, xs_meas.dtype)), None, length=iters
    )
    r = residuals(wind)
    rms = jnp.sqrt(jnp.mean(r * r))
    return MHEResult(wind=wind, residual=rms, converged=rms < 1.0)
