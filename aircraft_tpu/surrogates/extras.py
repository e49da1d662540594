"""Auxiliary surrogate families: batch-norm regression nets and a GP.

Parity targets from the reference inventory:
  * `Net2D` / `ControlNet` — small batch-norm MLP regressors used for 2D
    aero fits and control maps (reference surrogates/models.py:206-250).
    Here one generic `BatchNormMLP` pytree covers both shapes.
  * the optional gpytorch exact-GP surrogate (reference
    surrogates/models.py:20-51, unused in the main path) — here a compact
    pure-JAX exact GP with RBF kernel, hyperparameters fitted by gradient
    ascent on the log marginal likelihood (optax), predictive mean/std in
    closed form.

Both are host-side training utilities; their fitted parameters are plain
pytrees that trace cleanly into jitted rollouts if embedded.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---------------------------------------------------------------------------
# batch-norm MLP (Net2D / ControlNet role)
# ---------------------------------------------------------------------------


class BatchNormMLP(NamedTuple):
    """Linear→BN→ReLU stack pytree. `moments` holds running (mean, var) per
    hidden layer for inference mode."""

    weights: tuple
    biases: tuple
    bn_scale: tuple
    bn_shift: tuple
    bn_mean: tuple
    bn_var: tuple

    @staticmethod
    def init(key: jax.Array, sizes: Sequence[int]) -> "BatchNormMLP":
        ws, bs, sc, sh, mu, var = [], [], [], [], [], []
        for i in range(len(sizes) - 1):
            key, k = jax.random.split(key)
            fan = sizes[i]
            ws.append(jax.random.normal(k, (sizes[i], sizes[i + 1])) / np.sqrt(fan))
            bs.append(jnp.zeros(sizes[i + 1]))
            if i < len(sizes) - 2:  # no BN on the output layer
                sc.append(jnp.ones(sizes[i + 1]))
                sh.append(jnp.zeros(sizes[i + 1]))
                mu.append(jnp.zeros(sizes[i + 1]))
                var.append(jnp.ones(sizes[i + 1]))
        return BatchNormMLP(tuple(ws), tuple(bs), tuple(sc), tuple(sh),
                            tuple(mu), tuple(var))


def batchnorm_mlp_apply(
    p: BatchNormMLP, x: jax.Array, *, train: bool = False, momentum: float = 0.9
):
    """Forward pass. ``train=True`` normalises by batch statistics and
    returns (y, updated_params) with refreshed running moments; inference
    uses the stored moments and returns y only."""
    h = x
    new_mu, new_var = [], []
    n_hidden = len(p.bn_scale)
    for i, (W, b) in enumerate(zip(p.weights, p.biases)):
        h = h @ W + b
        if i < n_hidden:
            if train:
                m = jnp.mean(h, axis=0)
                v = jnp.var(h, axis=0) + 1e-5
                new_mu.append(momentum * p.bn_mean[i] + (1 - momentum) * m)
                new_var.append(momentum * p.bn_var[i] + (1 - momentum) * v)
            else:
                m, v = p.bn_mean[i], p.bn_var[i] + 1e-5
            h = (h - m) / jnp.sqrt(v) * p.bn_scale[i] + p.bn_shift[i]
            h = jax.nn.relu(h)
    if train:
        return h, p._replace(bn_mean=tuple(new_mu), bn_var=tuple(new_var))
    return h


def train_batchnorm_mlp(
    x: np.ndarray,
    y: np.ndarray,
    *,
    hidden: Sequence[int] = (64, 64),
    epochs: int = 100,
    batch_size: int = 256,
    learning_rate: float = 1e-3,
    seed: int = 0,
) -> tuple[BatchNormMLP, float]:
    """Adam regression fit; returns (params, final mse)."""
    key = jax.random.PRNGKey(seed)
    sizes = [x.shape[1], *hidden, y.shape[1]]
    params = BatchNormMLP.init(key, sizes)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred, p_new = batchnorm_mlp_apply(p, xb, train=True)
            return jnp.mean((pred - yb) ** 2), p_new

        (loss, p_new), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        # keep the non-trainable running moments from the forward pass
        params = params._replace(bn_mean=p_new.bn_mean, bn_var=p_new.bn_var)
        return params, opt_state, loss

    n = x.shape[0]
    steps = max(1, n // batch_size)
    loss = np.inf
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(steps):
            idx = order[i * batch_size : (i + 1) * batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x[idx]), jnp.asarray(y[idx])
            )
    return params, float(loss)


# ---------------------------------------------------------------------------
# exact GP surrogate (optional gpytorch model role)
# ---------------------------------------------------------------------------


class GPParams(NamedTuple):
    log_lengthscale: jax.Array   # (d,)
    log_outputscale: jax.Array   # ()
    log_noise: jax.Array         # ()


def _rbf(xa: jax.Array, xb: jax.Array, p: GPParams) -> jax.Array:
    ls = jnp.exp(p.log_lengthscale)
    d = (xa[:, None, :] - xb[None, :, :]) / ls
    return jnp.exp(p.log_outputscale) * jnp.exp(-0.5 * jnp.sum(d * d, axis=-1))


def gp_neg_log_marginal(p: GPParams, x: jax.Array, y: jax.Array) -> jax.Array:
    n = x.shape[0]
    K = _rbf(x, x, p) + jnp.exp(p.log_noise) * jnp.eye(n)
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), y)
    return (0.5 * y @ alpha + jnp.sum(jnp.log(jnp.diagonal(L)))
            + 0.5 * n * jnp.log(2.0 * jnp.pi))


class GPSurrogate(NamedTuple):
    """Fitted exact GP for one scalar output."""

    params: GPParams
    x_train: jax.Array
    chol: jax.Array
    alpha: jax.Array

    @staticmethod
    def fit(x: np.ndarray, y: np.ndarray, *, iters: int = 200,
            learning_rate: float = 5e-2) -> "GPSurrogate":
        x_j = jnp.asarray(x, dtype=jnp.float64)
        y_j = jnp.asarray(y, dtype=jnp.float64)
        p = GPParams(
            log_lengthscale=jnp.zeros(x.shape[1], dtype=jnp.float64),
            log_outputscale=jnp.asarray(0.0, dtype=jnp.float64),
            log_noise=jnp.asarray(-4.0, dtype=jnp.float64),
        )
        tx = optax.adam(learning_rate)
        opt_state = tx.init(p)

        @jax.jit
        def step(p, opt_state):
            loss, grads = jax.value_and_grad(gp_neg_log_marginal)(p, x_j, y_j)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(p, updates), opt_state, loss

        for _ in range(iters):
            p, opt_state, _ = step(p, opt_state)

        K = _rbf(x_j, x_j, p) + jnp.exp(p.log_noise) * jnp.eye(x_j.shape[0])
        L = jnp.linalg.cholesky(K)
        alpha = jax.scipy.linalg.cho_solve((L, True), y_j)
        return GPSurrogate(params=p, x_train=x_j, chol=L, alpha=alpha)

    def predict(self, x_new: np.ndarray) -> tuple[jax.Array, jax.Array]:
        """(mean, std) at query points."""
        xq = jnp.asarray(x_new, dtype=self.x_train.dtype)
        Ks = _rbf(xq, self.x_train, self.params)
        mean = Ks @ self.alpha
        v = jax.scipy.linalg.solve_triangular(self.chol, Ks.T, lower=True)
        var = (jnp.exp(self.params.log_outputscale)
               + jnp.exp(self.params.log_noise) - jnp.sum(v * v, axis=0))
        return mean, jnp.sqrt(jnp.maximum(var, 1e-12))
