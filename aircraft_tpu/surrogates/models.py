"""Surrogate aero-coefficient model training (optax) and classical fits.

Replaces the reference's torch training stack (reference
main/surrogates/train_nn_surrogate.py, src/aircraft/surrogates/models.py)
and the sklearn linear/polynomial fits (main/surrogates/
{linear_coefficients,polynomial_model}.py) with JAX/optax + closed-form
least squares.  The trained artifacts ARE the coefficient-model params
pytrees consumed directly by the dynamics — no pickle/L4CasADi bridge.

Data layout matches the reference CSVs (data/processed/data_sim.csv):
inputs [q, alpha, beta, aileron, elevator] -> outputs [CX, CY, CZ, Cl, Cm, Cn].
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aircraft_tpu.dynamics.coefficients import (
    LinearCoeffParams,
    MLPCoeffParams,
    PolyCoeffParams,
    mlp_forward,
    polynomial_exponents,
)

INPUT_COLS = ["q", "alpha", "beta", "aileron", "elevator"]
OUTPUT_COLS = ["CX", "CY", "CZ", "Cl", "Cm", "Cn"]


def load_aero_csv(path) -> tuple[np.ndarray, np.ndarray]:
    """Read a reference-format aero CSV into (inputs (N,5), outputs (N,6))
    (role of `AeroDataset`, reference surrogates/dataloader.py:22-60)."""
    import pandas as pd

    df = pd.read_csv(path)
    x = df[INPUT_COLS].to_numpy(dtype=np.float32)
    y = df[OUTPUT_COLS].to_numpy(dtype=np.float32)
    mask = np.all(np.isfinite(x), axis=1) & np.all(np.isfinite(y), axis=1)
    return x[mask], y[mask]


# ---------------------------------------------------------------------------
# classical fits
# ---------------------------------------------------------------------------


def fit_linear(x: np.ndarray, y: np.ndarray) -> LinearCoeffParams:
    """Least-squares affine fit -> (6, 6) matrix over [inputs, 1]
    (reference main/surrogates/linear_coefficients.py)."""
    xh = np.concatenate([x, np.ones((x.shape[0], 1), dtype=x.dtype)], axis=1)
    coef, *_ = np.linalg.lstsq(xh, y, rcond=None)
    return LinearCoeffParams(matrix=jnp.asarray(coef.T.astype(np.float32)))


def fit_polynomial(
    x: np.ndarray, y: np.ndarray, degree: int = 3, span: float = 2.0,
    ridge: float = 1e-8,
) -> PolyCoeffParams:
    """Degree-3 polynomial-features regression per output coefficient
    (reference main/surrogates/polynomial_model.py:236-247).  Inputs are
    standardised by their max-abs to keep the cubic features conditioned.
    """
    x = np.asarray(x, dtype=np.float64)   # cubic features need f64 conditioning
    y = np.asarray(y, dtype=np.float64)
    scale = 1.0 / np.maximum(np.abs(x).max(axis=0), 1e-9)
    exps = polynomial_exponents(5, degree)
    feats = np.prod((x * scale)[:, None, :] ** exps[None], axis=-1)  # (N, F)
    # centred least squares: regress centred targets on centred features,
    # recover the intercept exactly (centring also conditions the Gram)
    fm = feats.mean(axis=0)
    ym = y.mean(axis=0)
    fc = feats - fm
    A = fc.T @ fc + ridge * np.eye(feats.shape[1])
    W = np.linalg.solve(A, fc.T @ (y - ym))
    intercept = ym - fm @ W
    return PolyCoeffParams.make(
        weights=W.T.astype(np.float32),
        intercept=intercept.astype(np.float32),
        span=span,
        degree=degree,
        input_scale=scale.astype(np.float32),
    )


# ---------------------------------------------------------------------------
# neural surrogate training
# ---------------------------------------------------------------------------


class TrainResult(NamedTuple):
    params: MLPCoeffParams
    train_loss: float
    val_loss: float
    epochs_run: int


def weighted_mse(pred: jax.Array, target: jax.Array, weights: jax.Array) -> jax.Array:
    """1/σ² weighted MSE (reference `WeightedMSELoss`,
    surrogates/models.py:157-166)."""
    return jnp.mean(weights * (pred - target) ** 2)


def weighted_mse_constraint(
    pred: jax.Array,
    target: jax.Array,
    weights: jax.Array,
    zero_pred: jax.Array,
    zero_weight: float = 1.0,
) -> jax.Array:
    """Weighted MSE plus a penalty anchoring the model's response at the
    zero aero input to zero coefficients (reference
    `WeightedMSELossConstraint`, surrogates/models.py:171-202): pass
    ``zero_pred = model(zeros(5))`` so e.g. CY/Cl/Cn vanish in symmetric
    flow regardless of data coverage."""
    return weighted_mse(pred, target, weights) + zero_weight * jnp.mean(
        zero_pred**2
    )


def train_mlp(
    x: np.ndarray,
    y: np.ndarray,
    *,
    key: Optional[jax.Array] = None,
    epochs: int = 200,
    batch_size: int = 512,
    learning_rate: float = 1e-3,
    val_fraction: float = 0.1,
    patience: int = 10,
    seed: int = 0,
) -> TrainResult:
    """Train the ScaledModel-architecture surrogate with standardisation
    baked into the params (reference train_nn_surrogate.py:43-120; optax
    Adam replaces SGD+momentum — converges in far fewer epochs).
    """
    key = key if key is not None else jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)

    n = x.shape[0]
    perm = rng.permutation(n)
    n_val = max(1, int(n * val_fraction))
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    x_train, y_train = x[train_idx], y[train_idx]
    x_val, y_val = jnp.asarray(x[val_idx]), jnp.asarray(y[val_idx])

    in_mean = x_train.mean(axis=0)
    in_std = x_train.std(axis=0) + 1e-8
    out_mean = y_train.mean(axis=0)
    out_std = y_train.std(axis=0) + 1e-8
    weights = jnp.asarray(1.0 / (y_train.std(axis=0) + 1e-8) ** 2)

    params = MLPCoeffParams.init(key).replace(
        input_mean=jnp.asarray(in_mean),
        input_std=jnp.asarray(in_std),
        output_mean=jnp.asarray(out_mean),
        output_std=jnp.asarray(out_std),
    )

    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, xb, yb):
        def loss_fn(p):
            return weighted_mse(mlp_forward(p, xb), yb, weights)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # scalers are frozen: zero their gradients
        grads = grads.replace(
            input_mean=jnp.zeros_like(grads.input_mean),
            input_std=jnp.zeros_like(grads.input_std),
            output_mean=jnp.zeros_like(grads.output_mean),
            output_std=jnp.zeros_like(grads.output_std),
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def val_loss_fn(params):
        return weighted_mse(mlp_forward(params, x_val), y_val, weights)

    best_val = np.inf
    best_params = params
    bad_epochs = 0
    n_train = x_train.shape[0]
    steps = max(1, n_train // batch_size)
    last_train = np.inf

    for epoch in range(epochs):
        order = rng.permutation(n_train)
        losses = []
        for i in range(steps):
            idx = order[i * batch_size : (i + 1) * batch_size]
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(x_train[idx]), jnp.asarray(y_train[idx])
            )
            losses.append(float(loss))
        last_train = float(np.mean(losses))
        v = float(val_loss_fn(params))
        if v < best_val - 1e-7:
            best_val, best_params, bad_epochs = v, params, 0
        else:
            bad_epochs += 1
            if bad_epochs >= patience:  # early stop (reference patience=2)
                break

    return TrainResult(
        params=best_params, train_loss=last_train, val_loss=best_val,
        epochs_run=epoch + 1,
    )


# ---------------------------------------------------------------------------
# checkpoint IO (npz pytree — replaces torch .pth; loader for reference .pth
# lives on MLPCoeffParams.from_torch_checkpoint)
# ---------------------------------------------------------------------------


def save_mlp(path, params: MLPCoeffParams) -> None:
    flat = {
        k: np.asarray(v)
        for k, v in params.__dict__.items()
        if isinstance(v, (jnp.ndarray, np.ndarray)) or hasattr(v, "shape")
    }
    np.savez(path, **flat)


def load_mlp(path) -> MLPCoeffParams:
    data = np.load(path)
    return MLPCoeffParams(**{k: jnp.asarray(v) for k, v in data.items()})
