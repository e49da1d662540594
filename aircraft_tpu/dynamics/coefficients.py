"""Aerodynamic coefficient models as pure JAX functions.

The reference binds these into a CasADi graph (reference
src/aircraft/dynamics/coefficient_models.py); here each model is a params
pytree + an ``apply`` function mapping flow conditions to the six
body-frame coefficients ``[CX, CY, CZ, Cl, Cm, Cn]``.  All models broadcast
over leading batch axes and trace cleanly under jit/vmap/grad — the neural
model in particular is *just a function* (no L4CasADi-style bridge needed):
its forward and gradients are fused into the integrator by XLA.

Model inventory (parity with reference registry, coefficient_models.py:32-37):
  default : hard-coded linear aero + rate damping
  linear  : affine map fitted from data (linearised.csv)
  poly    : degree-3 polynomial features per output, with per-surface
            local-flow re-evaluation (wing asymmetry -> roll moment)
  nn      : ScaledModel MLP 5-16-32(tanh)-6 with input/output standardisation
"""

from __future__ import annotations

from functools import singledispatch
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

DEG2RAD = np.pi / 180.0


@struct.dataclass
class AeroState:
    """Flow conditions feeding the coefficient models.

    Per-surface effective quantities implement the rate-damping corrections
    of the reference (reference dynamics/aircraft.py:189-253): the elevator
    sees a pitch-rate-shifted alpha, each wing a roll-rate-shifted alpha and
    yaw-rate-shifted dynamic pressure, the rudder a yaw-rate-shifted beta.
    """

    qbar: jax.Array
    alpha: jax.Array
    beta: jax.Array
    omega: jax.Array          # body rates (p, q, r)
    elevator_alpha: jax.Array
    left_wing_alpha: jax.Array
    right_wing_alpha: jax.Array
    left_wing_qbar: jax.Array
    right_wing_qbar: jax.Array
    rudder_beta: jax.Array

    @property
    def base_inputs(self) -> jax.Array:
        """Canonical 5-vector model input [qbar, alpha, beta, da, de] is
        assembled by the caller; this exposes the flow-only triple."""
        return jnp.stack([self.qbar, self.alpha, self.beta], axis=-1)


def model_inputs(aero: AeroState, aileron: jax.Array, elevator: jax.Array) -> jax.Array:
    """[qbar, alpha, beta, aileron, elevator] — the shared model input layout
    (reference dynamics/aircraft.py:269-275)."""
    return jnp.stack([aero.qbar, aero.alpha, aero.beta, aileron, elevator], axis=-1)


# ---------------------------------------------------------------------------
# default — hard-coded linear aero (reference coefficient_models.py:41-78)
# ---------------------------------------------------------------------------


@struct.dataclass
class DefaultCoeffParams:
    CD0: float = 0.02
    CD_alpha: float = 0.3
    CL0: float = 0.0
    CL_alpha: float = 5.0
    CY_beta: float = -0.98
    Cl_aileron: float = 0.08
    Cl_p: float = -0.05
    Cm_elevator: float = -1.2
    Cm_q: float = -0.5
    Cn_rudder: float = -0.1
    Cn_r: float = -0.05


def _apply_default(cp: DefaultCoeffParams, aero: AeroState, aileron, elevator, rudder):
    p, q, r = aero.omega[..., 0], aero.omega[..., 1], aero.omega[..., 2]
    CD = cp.CD0 + cp.CD_alpha * aero.alpha**2
    CL = cp.CL0 + cp.CL_alpha * aero.alpha
    CY = cp.CY_beta * aero.beta
    Cl = cp.Cl_aileron * 4.0 * aileron * DEG2RAD + cp.Cl_p * p
    Cm = cp.Cm_elevator * 5.0 * elevator * DEG2RAD + cp.Cm_q * q
    Cn = cp.Cn_rudder * 6.0 * rudder * DEG2RAD + cp.Cn_r * r
    return jnp.stack([-CD, CY, -CL, Cl, Cm, Cn], axis=-1)


# ---------------------------------------------------------------------------
# linear — affine map from fitted CSV (reference coefficient_models.py:80-89)
# ---------------------------------------------------------------------------


@struct.dataclass
class LinearCoeffParams:
    # (6, 6): rows = [CX, CY, CZ, Cl, Cm, Cn], cols = [q, alpha, beta, da, de, 1]
    matrix: jax.Array
    Cn_rudder: float = -0.1

    @classmethod
    def from_csv(cls, path) -> "LinearCoeffParams":
        import pandas as pd

        return cls(matrix=jnp.asarray(np.array(pd.read_csv(path)), dtype=jnp.float32))


def _apply_linear(cp: LinearCoeffParams, aero: AeroState, aileron, elevator, rudder):
    x = model_inputs(aero, aileron, elevator)
    xh = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    out = xh @ cp.matrix.T
    corr = cp.Cn_rudder * 6.0 * rudder * DEG2RAD
    return out.at[..., 5].add(corr)


# ---------------------------------------------------------------------------
# poly — polynomial features + per-surface re-evaluation
# (reference coefficient_models.py:106-133, fit by main/surrogates/polynomial_model.py)
# ---------------------------------------------------------------------------


def polynomial_exponents(num_inputs: int = 5, degree: int = 3) -> np.ndarray:
    """Exponent matrix of all monomials with 1 <= total degree <= `degree`,
    ordered like sklearn PolynomialFeatures(include_bias=False)."""
    from itertools import combinations_with_replacement

    rows = []
    for d in range(1, degree + 1):
        for combo in combinations_with_replacement(range(num_inputs), d):
            e = np.zeros(num_inputs, dtype=np.int32)
            for idx in combo:
                e[idx] += 1
            rows.append(e)
    return np.stack(rows)


@struct.dataclass
class PolyCoeffParams:
    # static monomial structure — stored hashably (tuple of tuples) so the
    # params pytree remains a valid jit static/dynamic split
    exponents: tuple = struct.field(pytree_node=False)       # (F, 5) int
    weights: jax.Array                                       # (6, F)
    intercept: jax.Array                                     # (6,)
    input_scale: jax.Array                                   # (5,) input normalisation
    span_over_4: float = 0.5     # b/4 lever arm for the wing-asymmetry roll term
    Cn_rudder: float = 0.01

    @classmethod
    def make(cls, weights, intercept, span: float = 2.0, degree: int = 3,
             input_scale=None) -> "PolyCoeffParams":
        exps = tuple(
            tuple(int(v) for v in row) for row in polynomial_exponents(5, degree)
        )
        weights = jnp.asarray(weights, dtype=jnp.float32)
        assert weights.shape == (6, len(exps)), weights.shape
        return cls(
            exponents=exps,
            weights=weights,
            intercept=jnp.asarray(intercept, dtype=jnp.float32),
            input_scale=jnp.ones(5, dtype=jnp.float32)
            if input_scale is None
            else jnp.asarray(input_scale, dtype=jnp.float32),
            span_over_4=span / 4.0,
        )


def _poly_features(x: jax.Array, exponents) -> jax.Array:
    """Evaluate all monomials; (..., 5) -> (..., F). Tiny powers, so the
    broadcasted `prod(x**e)` fuses into a handful of VPU ops."""
    e = jnp.asarray(np.asarray(exponents), dtype=x.dtype)
    return jnp.prod(x[..., None, :] ** e, axis=-1)


def _poly_eval(cp: PolyCoeffParams, x: jax.Array) -> jax.Array:
    feats = _poly_features(x * cp.input_scale, cp.exponents)
    return feats @ cp.weights.T + cp.intercept


def _apply_poly(cp: PolyCoeffParams, aero: AeroState, aileron, elevator, rudder):
    out = _poly_eval(cp, model_inputs(aero, aileron, elevator))

    # wing-asymmetry roll moment from per-wing local flow
    zeros = jnp.zeros_like(aero.alpha)
    lw = jnp.stack([aero.left_wing_qbar, aero.left_wing_alpha, zeros, zeros, zeros], axis=-1)
    rw = jnp.stack([aero.right_wing_qbar, aero.right_wing_alpha, zeros, zeros, zeros], axis=-1)
    lw_cz = _poly_eval(cp, lw)[..., 2]
    rw_cz = _poly_eval(cp, rw)[..., 2]
    # span lever arm b/4 is folded in by the caller via `span`; kept here for parity
    out = out.at[..., 3].add(cp.span_over_4 * (rw_cz / 2.0 - lw_cz / 2.0))

    # elevator pitching moment at pitch-rate-corrected alpha
    el = jnp.stack([aero.qbar, aero.elevator_alpha, aero.beta, aileron, elevator], axis=-1)
    out = out.at[..., 4].set(_poly_eval(cp, el)[..., 4])

    # rudder yawing moment at yaw-rate-corrected beta
    rud = jnp.stack([aero.qbar, aero.alpha, aero.rudder_beta, aileron, elevator], axis=-1)
    out = out.at[..., 5].set(_poly_eval(cp, rud)[..., 5])
    out = out.at[..., 5].add(cp.Cn_rudder * 6.0 * rudder * DEG2RAD)
    return out


# ---------------------------------------------------------------------------
# nn — ScaledModel MLP (reference surrogates/models.py:101-155, embedded via
# L4CasADi in coefficient_models.py:91-104; here it is simply traced)
# ---------------------------------------------------------------------------


@struct.dataclass
class MLPCoeffParams:
    """ScaledModel: standardise -> Linear(5,16) -> Linear(16,32) -> tanh ->
    Linear(32,6) -> de-standardise."""

    w0: jax.Array  # (5, 16)
    b0: jax.Array  # (16,)
    w1: jax.Array  # (16, 32)
    b1: jax.Array  # (32,)
    w2: jax.Array  # (32, 6)
    b2: jax.Array  # (6,)
    input_mean: jax.Array   # (5,)
    input_std: jax.Array    # (5,)
    output_mean: jax.Array  # (6,)
    output_std: jax.Array   # (6,)
    Cn_rudder: float = -0.1

    @classmethod
    def init(cls, key: jax.Array, scale: float = 0.5) -> "MLPCoeffParams":
        k0, k1, k2 = jax.random.split(key, 3)

        def lin(k, fan_in, fan_out):
            bound = scale / np.sqrt(fan_in)
            return jax.random.uniform(k, (fan_in, fan_out), minval=-bound, maxval=bound)

        return cls(
            w0=lin(k0, 5, 16), b0=jnp.zeros(16),
            w1=lin(k1, 16, 32), b1=jnp.zeros(32),
            w2=lin(k2, 32, 6), b2=jnp.zeros(6),
            input_mean=jnp.zeros(5), input_std=jnp.ones(5),
            output_mean=jnp.zeros(6), output_std=jnp.ones(6),
        )

    @classmethod
    def from_torch_checkpoint(cls, path) -> "MLPCoeffParams":
        """Load the reference .pth checkpoint layout
        (reference utils.py:22-40: state_dict + 4 scaler tensors)."""
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        sd = ckpt["model_state_dict"]

        def t(x):
            return jnp.asarray(np.asarray(x, dtype=np.float32))

        return cls(
            w0=t(sd["core_layers.0.weight"]).T, b0=t(sd["core_layers.0.bias"]),
            w1=t(sd["core_layers.1.weight"]).T, b1=t(sd["core_layers.1.bias"]),
            w2=t(sd["core_layers.3.weight"]).T, b2=t(sd["core_layers.3.bias"]),
            input_mean=t(ckpt["input_mean"]), input_std=t(ckpt["input_std"]),
            output_mean=t(ckpt["output_mean"]), output_std=t(ckpt["output_std"]),
        )


@struct.dataclass
class MiniMLPCoeffParams:
    """MiniModel: standardise -> Linear(5,16) -> ELU -> Linear(16,32) -> ELU
    -> Linear(32,6) -> de-standardise (reference surrogates/models.py:56-99,
    the ELU alternative to ScaledModel)."""

    w0: jax.Array
    b0: jax.Array
    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array
    input_mean: jax.Array
    input_std: jax.Array
    output_mean: jax.Array
    output_std: jax.Array
    Cn_rudder: float = -0.1

    @classmethod
    def init(cls, key: jax.Array, scale: float = 0.5) -> "MiniMLPCoeffParams":
        k0, k1, k2 = jax.random.split(key, 3)

        def lin(k, fan_in, fan_out):
            bound = scale / np.sqrt(fan_in)
            return jax.random.uniform(k, (fan_in, fan_out), minval=-bound, maxval=bound)

        return cls(
            w0=lin(k0, 5, 16), b0=jnp.zeros(16),
            w1=lin(k1, 16, 32), b1=jnp.zeros(32),
            w2=lin(k2, 32, 6), b2=jnp.zeros(6),
            input_mean=jnp.zeros(5), input_std=jnp.ones(5),
            output_mean=jnp.zeros(6), output_std=jnp.ones(6),
        )


def mini_mlp_forward(cp: MiniMLPCoeffParams, x: jax.Array) -> jax.Array:
    h = (x - cp.input_mean) / cp.input_std
    h = jax.nn.elu(h @ cp.w0 + cp.b0)
    h = jax.nn.elu(h @ cp.w1 + cp.b1)
    h = h @ cp.w2 + cp.b2
    return h * cp.output_std + cp.output_mean


def _apply_mini_mlp(cp: MiniMLPCoeffParams, aero: AeroState, aileron, elevator, rudder):
    out = mini_mlp_forward(cp, model_inputs(aero, aileron, elevator))
    return out.at[..., 5].add(cp.Cn_rudder * 6.0 * rudder * DEG2RAD)


def mlp_forward(cp: MLPCoeffParams, x: jax.Array) -> jax.Array:
    """Raw ScaledModel forward on (..., 5) inputs."""
    h = (x - cp.input_mean) / cp.input_std
    h = h @ cp.w0 + cp.b0
    h = h @ cp.w1 + cp.b1
    h = jnp.tanh(h)
    h = h @ cp.w2 + cp.b2
    return h * cp.output_std + cp.output_mean


def _apply_mlp(cp: MLPCoeffParams, aero: AeroState, aileron, elevator, rudder):
    out = mlp_forward(cp, model_inputs(aero, aileron, elevator))
    return out.at[..., 5].add(cp.Cn_rudder * 6.0 * rudder * DEG2RAD)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------



# ---------------------------------------------------------------------------
# taylor — first-order anchor-point approximation of another model
# (reference RealTimeL4CasADi, coefficient_models.py:93-104: embeds the NN
# as a first-order Taylor expansion refreshed around the current operating
# point instead of the full network)
# ---------------------------------------------------------------------------


@struct.dataclass
class TaylorCoeffParams:
    """Affine surrogate C(x) ~= value + J (x - anchor) of a differentiable
    coefficient model around an anchor input.

    The reference's real-time mode exists because evaluating libtorch inside
    every IPOPT iteration is expensive; here the MLP traces into XLA anyway,
    but the affine form still (a) removes the MLP's nonlinearity from the
    window program (smaller, faster compile) and (b) reproduces the
    reference's formulation for parity runs.  Re-anchoring is `from_model`
    under jit — a pure function of the carried warm-start state, so an MPC
    loop can refresh it every window at negligible cost.
    """

    anchor: jax.Array    # (5,) [qbar, alpha, beta, da, de]
    value: jax.Array     # (6,) model output at the anchor
    jac: jax.Array       # (6, 5) model Jacobian at the anchor
    Cn_rudder: float = -0.1

    @classmethod
    def from_model(cls, cp, anchor) -> "TaylorCoeffParams":
        """Anchor around `anchor` inputs; `cp` is any coefficient params
        whose raw forward is registered in `raw_forward`."""
        anchor = jnp.asarray(anchor)
        f = lambda x: raw_forward(cp, x)
        return cls(
            anchor=anchor,
            value=f(anchor),
            jac=jax.jacfwd(f)(anchor),
            Cn_rudder=getattr(cp, "Cn_rudder", -0.1),
        )


def _taylor_eval(cp: TaylorCoeffParams, x: jax.Array) -> jax.Array:
    return cp.value + (x - cp.anchor) @ cp.jac.T


def _apply_taylor(cp: TaylorCoeffParams, aero: AeroState, aileron, elevator, rudder):
    out = _taylor_eval(cp, model_inputs(aero, aileron, elevator))
    return out.at[..., 5].add(cp.Cn_rudder * 6.0 * rudder * DEG2RAD)


@singledispatch
def raw_forward(cp: Any, x: jax.Array) -> jax.Array:
    """Raw (..., 5) -> (..., 6) forward of a coefficient model on explicit
    inputs (no per-surface corrections) — the function the Taylor mode
    linearises."""
    raise TypeError(f"No raw forward registered for: {type(cp)}")


raw_forward.register(MLPCoeffParams, mlp_forward)
raw_forward.register(MiniMLPCoeffParams, mini_mlp_forward)
raw_forward.register(
    LinearCoeffParams,
    lambda cp, x: jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1) @ cp.matrix.T,
)
# PolyCoeffParams is deliberately NOT registered: _apply_poly adds
# per-surface re-evaluations (wing-asymmetry roll, elevator-alpha /
# rudder-beta moments) on top of _poly_eval, so an affine expansion of the
# raw forward would silently drop rate-damping physics rather than
# first-order-approximate the model.  (The reference's real-time mode only
# ever wraps the NN, coefficient_models.py:93-104.)


@singledispatch
def apply_coefficients(cp: Any, aero: AeroState, aileron, elevator, rudder) -> jax.Array:
    raise TypeError(f"Unknown coefficient params type: {type(cp)}")


apply_coefficients.register(DefaultCoeffParams, _apply_default)
apply_coefficients.register(LinearCoeffParams, _apply_linear)
apply_coefficients.register(PolyCoeffParams, _apply_poly)
apply_coefficients.register(MLPCoeffParams, _apply_mlp)
apply_coefficients.register(MiniMLPCoeffParams, _apply_mini_mlp)
apply_coefficients.register(TaylorCoeffParams, _apply_taylor)


COEFF_MODEL_REGISTRY = {
    "default": DefaultCoeffParams,
    "linear": LinearCoeffParams,
    "poly": PolyCoeffParams,
    "nn": MLPCoeffParams,
    "nn_mini": MiniMLPCoeffParams,
    "nn_taylor": TaylorCoeffParams,
}


def poly_from_npz(path) -> PolyCoeffParams:
    """Load a polynomial model saved by examples/fit_surrogates.py."""
    d = np.load(path)
    return PolyCoeffParams.make(
        weights=d["weights"], intercept=d["intercept"],
        span=float(d["span_over_4"]) * 4.0, input_scale=d["input_scale"],
    )


def load_coefficient_model(kind: str, path=None):
    """Name+path loader with the reference registry's semantics
    (reference coefficient_models.py:32-37): 'default' needs no artifact;
    'linear' reads a CSV; 'poly' an npz; 'nn' an npz (ours) or .pth
    (reference checkpoint)."""
    if kind == "default":
        return DefaultCoeffParams()
    if kind == "linear":
        return LinearCoeffParams.from_csv(path)
    if kind == "poly":
        return poly_from_npz(path)
    if kind == "nn":
        if str(path).endswith(".pth"):
            return MLPCoeffParams.from_torch_checkpoint(path)
        from aircraft_tpu.surrogates.models import load_mlp

        return load_mlp(path)
    raise ValueError(f"unknown coefficient model kind: {kind}")


def default_artifact_coeff(kind: str):
    """Coefficient model of the given kind from the repo's standard fitted
    artifacts (data/networks/{linearised.csv, poly.npz, mlp.npz}, regenerated
    from the reference's wind-tunnel CSV by examples/fit_surrogates.py — the
    role of the reference's data/networks/{linearised.csv,
    fitted_models_casadi.pkl, model-dynamics.pth}).  'nn' falls back to a
    plausibly-scaled random MLP when the artifact is absent (see
    default_nn_coeff); 'linear'/'poly' fall back to 'default' with a
    warning, since a random linear/poly map is not a usable aero model."""
    import os
    import warnings

    if kind == "default":
        return DefaultCoeffParams()
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "data", "networks",
    )
    if kind == "nn":
        return default_nn_coeff()
    path = {
        "linear": os.path.join(base, "linearised.csv"),
        "poly": os.path.join(base, "poly.npz"),
    }[kind]
    if not os.path.exists(path):
        warnings.warn(f"{kind} artifact missing at {path}; using 'default'")
        return DefaultCoeffParams()
    return load_coefficient_model(kind, path)


def default_nn_coeff(path=None):
    """The canonical 'nn' model for harnesses: the trained surrogate at
    ``data/networks/mlp.npz`` when present (the reference grid ran ITS
    trained models), else a randomly-initialised MLP with plausible
    input/output scalings (an unscaled random MLP is aerodynamic noise —
    it has no trim and poisons every solve that uses it).  Single source
    for bench.py and ablation.py, which previously each hard-coded the
    lookup with DIFFERENT fallbacks."""
    import os

    import jax

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "data", "networks", "mlp.npz",
        )
    if os.path.exists(str(path)):
        from aircraft_tpu.surrogates.models import load_mlp

        return load_mlp(path)
    return MLPCoeffParams.init(jax.random.PRNGKey(0)).replace(
        input_mean=jnp.asarray([1500.0, 0.0, 0.0, 0.0, 0.0]),
        input_std=jnp.asarray([1000.0, 0.15, 0.15, 3.0, 3.0]),
        output_mean=jnp.asarray([-0.05, 0.0, -0.4, 0.0, 0.0, 0.0]),
        output_std=jnp.asarray([0.05, 0.05, 0.3, 0.03, 0.1, 0.01]),
    )
