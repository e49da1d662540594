"""Flight-data system identification: recover aero coefficient models from
recorded trajectories.

Counterpart of the reference's `main/surrogates/from_flight.py` (dead code
there — its flight logs are missing, reference from_flight.py:4).  Here the
pipeline is live and test-covered against synthetic "flight data" generated
by the plant itself:

  1. `extract_coefficients` inverts the rigid-body dynamics sample-by-sample
     (central-difference accelerations -> body forces/moments -> the six
     aero coefficients), vmapped over the whole trajectory on device.
  2. The existing fitters (`fit_linear`, `fit_polynomial`, `train_mlp`)
     regress a coefficient model on the extracted (inputs, coefficients)
     samples — the same fitters used for wind-tunnel CSVs, so a flight log
     and a tunnel run are interchangeable data sources.

The inversion undoes, in order, everything `aircraft.forces_frd` /
`moments_frd` apply on top of the raw model outputs: thrust, the CoM
force-moment cross term, the q̄·S·[1|b,c,b] normalisation, the drag-axis
sign flip, flap increments, and stall scaling — so the extracted samples
are in the exact frame the coefficient models are trained in.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.dynamics import aircraft as ac
from aircraft_tpu.dynamics import base
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.dynamics.coefficients import model_inputs
from aircraft_tpu.ops import quaternion as quat
from aircraft_tpu.surrogates import models as surrogate_models


class FlightSamples(NamedTuple):
    """Extracted training samples: model inputs and the six coefficients."""

    inputs: np.ndarray        # (n, 5) [qbar, alpha, beta, aileron, elevator]
    coefficients: np.ndarray  # (n, 6) [CX, CY, CZ, Cl, Cm, Cn]
    qbar: np.ndarray          # (n,) for weighting / filtering


class FitReport(NamedTuple):
    params: object            # fitted coefficient-model pytree
    r2: np.ndarray            # (6,) per-coefficient R^2 on the fit data
    samples: FlightSamples


def _extract_one(params: AircraftParams, x, u, v_dot, omega_dot, wind):
    """Invert the Newton-Euler + aero pipeline at one sample (traced; the
    caller vmaps over time)."""
    q = x[..., base.QUAT]
    omega = x[..., base.OMEGA]

    # total body force from measured acceleration (undo gravity + frame)
    f_total = quat.rotate_inv(q, (v_dot - params.gravity) * params.mass)
    f_aero = f_total - u[..., ac.THRUST] if params.thrust_enabled else f_total

    # total moment from measured angular acceleration
    inertia = base.inertia_about_com(params.static_inertia, params.mass,
                                     ac.effective_com(params, u))
    J_omega = jnp.einsum("...ij,...j->...i", inertia, omega)
    m_total = jnp.einsum("...ij,...j->...i", inertia, omega_dot) + jnp.cross(
        omega, J_omega)
    # the forward plant's CoM moment arm acts on the TOTAL body force
    # including thrust (moments_frd: m_aero + com x forces_frd), so the
    # inversion must subtract com x f_total, not com x f_aero
    m_aero = m_total - jnp.cross(ac.effective_com(params, u), f_total)

    aero = ac.aero_state(params, x, u, wind)
    denom_f = aero.qbar * params.S
    denom_m = denom_f[..., None] * jnp.stack(
        [params.b, params.c, params.b], axis=-1)

    cf = f_aero / denom_f[..., None]
    cm = m_aero / denom_m

    # undo the drag-axis sign flip (forces_frd: f_x *= sign(u_rel))
    u_rel = ac.v_frd_rel(params, x, u, wind)[..., 0]
    cf = cf.at[..., 0].multiply(jnp.sign(u_rel))

    coeffs = jnp.concatenate([cf, cm], axis=-1)

    # undo the post-hoc rudder yaw correction: every fitted model's apply
    # function re-adds Cn_rudder*6*rudder*deg2rad at plant-eval time
    # (coefficients._apply_linear/_apply_poly/_apply_mlp), so the training
    # target must be the RAW 5-input model output with that term removed —
    # otherwise the fit absorbs it through correlated inputs and the
    # plugged-back model double-counts the rudder moment
    cn_rudder = getattr(params.coeff, "Cn_rudder", -0.1)
    coeffs = coeffs.at[..., 5].add(
        -cn_rudder * 6.0 * u[..., ac.RUDDER] * np.deg2rad(1.0))

    # undo flap increments
    flaps = u[..., ac.FLAPS]
    coeffs = coeffs.at[..., 0].add(-ac.C_D_FLAPS * flaps)
    coeffs = coeffs.at[..., 2].add(-ac.C_Z_FLAPS * flaps)

    # undo stall scaling (well-conditioned inside the envelope; the scale
    # only approaches 0 beyond +-30deg alpha/beta, which `extract` masks)
    if params.stall_scaling:
        stall_angle = np.deg2rad(30.0)
        steepness = 10.0
        alpha_scale = jax.nn.sigmoid(
            -steepness * (jnp.abs(aero.alpha) - stall_angle))
        beta_scale = jax.nn.sigmoid(
            -steepness * (jnp.abs(aero.beta) - stall_angle))
        coeffs = coeffs.at[..., 2].divide(
            jnp.maximum(alpha_scale * beta_scale, 1e-3))
        coeffs = coeffs.at[..., 4].divide(jnp.maximum(alpha_scale, 1e-3))

    inp = model_inputs(aero, u[..., ac.AILERON], u[..., ac.ELEVATOR])
    return inp, coeffs, aero.qbar, aero.alpha, aero.beta


def extract_coefficients(
    params: AircraftParams,
    xs: np.ndarray,
    us: np.ndarray,
    dt: float,
    wind=None,
    min_qbar: float = 10.0,
    max_angle_rad: float = np.deg2rad(25.0),
) -> FlightSamples:
    """Turn a recorded trajectory into coefficient-model training samples.

    xs: (T, 13) states sampled at `dt`; us: (T, n_u) or (T-1, n_u) controls.
    Accelerations come from central differences, so samples cover the
    interior points 1..T-2.  Samples outside the aero-model envelope
    (near-zero dynamic pressure, post-stall angles where the stall-scaling
    inversion is ill-conditioned) are dropped.
    """
    xs = jnp.asarray(xs)
    us = jnp.asarray(us)
    if us.shape[0] == xs.shape[0] - 1:
        us = jnp.concatenate([us, us[-1:]], axis=0)

    v = xs[:, base.VEL]
    om = xs[:, base.OMEGA]
    v_dot = (v[2:] - v[:-2]) / (2.0 * dt)
    omega_dot = (om[2:] - om[:-2]) / (2.0 * dt)
    x_mid, u_mid = xs[1:-1], us[1:-1]

    inp, coeffs, qbar, alpha, beta = jax.vmap(
        lambda x, u, vd, od: _extract_one(params, x, u, vd, od, wind)
    )(x_mid, u_mid, v_dot, omega_dot)

    inp = np.asarray(inp, dtype=np.float64)
    coeffs = np.asarray(coeffs, dtype=np.float64)
    qbar = np.asarray(qbar, dtype=np.float64)
    keep = (
        (qbar > min_qbar)
        & (np.abs(np.asarray(alpha)) < max_angle_rad)
        & (np.abs(np.asarray(beta)) < max_angle_rad)
        & np.all(np.isfinite(inp), axis=-1)
        & np.all(np.isfinite(coeffs), axis=-1)
    )
    return FlightSamples(inputs=inp[keep].astype(np.float32),
                         coefficients=coeffs[keep].astype(np.float32),
                         qbar=qbar[keep].astype(np.float32))


def _r2(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    ss_res = ((pred - target) ** 2).sum(axis=0)
    ss_tot = ((target - target.mean(axis=0)) ** 2).sum(axis=0)
    return 1.0 - ss_res / np.maximum(ss_tot, 1e-12)


def identify(
    params: AircraftParams,
    xs: np.ndarray,
    us: np.ndarray,
    dt: float,
    model: str = "linear",
    wind=None,
    **fit_kwargs,
) -> FitReport:
    """End-to-end sysid: trajectory -> samples -> fitted coefficient model.

    `model` is 'linear', 'poly', or 'nn' (same registry keys as the plant's
    coefficient models, so the fitted params drop straight into
    `AircraftParams.replace(coeff=...)`).
    """
    samples = extract_coefficients(params, xs, us, dt, wind=wind)
    x, y = samples.inputs, samples.coefficients
    if x.shape[0] < 16:
        raise ValueError(
            f"only {x.shape[0]} usable samples after envelope filtering")

    if model == "linear":
        fitted = surrogate_models.fit_linear(x, y)
        pred = x @ np.asarray(fitted.matrix).T[:5] + np.asarray(
            fitted.matrix)[:, 5]
    elif model == "poly":
        fitted = surrogate_models.fit_polynomial(x, y, **fit_kwargs)
        from aircraft_tpu.dynamics.coefficients import _poly_eval
        pred = np.asarray(_poly_eval(fitted, jnp.asarray(x)))
    elif model == "nn":
        result = surrogate_models.train_mlp(x, y, **fit_kwargs)
        fitted = result.params
        from aircraft_tpu.dynamics.coefficients import mlp_forward
        pred = np.asarray(mlp_forward(fitted, jnp.asarray(x)))
    else:
        raise ValueError(f"unknown model '{model}'")

    return FitReport(params=fitted, r2=_r2(pred, y), samples=samples)
