"""Pallas kernel vs jnp reference parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aircraft_tpu.config import glider_config
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.dynamics.coefficients import MLPCoeffParams
from aircraft_tpu.kernels import make_fused_rollout
from aircraft_tpu.solvers import integrators
from aircraft_tpu.solvers.rollout import batch_rollout

CFG = glider_config()


def make_params():
    coeff = MLPCoeffParams.init(jax.random.PRNGKey(0)).replace(
        input_mean=jnp.asarray([1500.0, 0.0, 0.0, 0.0, 0.0]),
        input_std=jnp.asarray([1000.0, 0.15, 0.15, 3.0, 3.0]),
        output_mean=jnp.asarray([-0.05, 0.0, -0.4, 0.0, 0.0, 0.0]),
        output_std=jnp.asarray([0.05, 0.05, 0.3, 0.03, 0.1, 0.01]),
    )
    return AircraftParams.from_config(CFG.aircraft, coeff=coeff)


class TestFusedRollout:
    def test_matches_jnp_reference(self):
        params = make_params()
        B, N, dt, ss = 128, 8, 0.01, 2
        rng = np.random.default_rng(3)
        x0 = np.tile(
            np.asarray(CFG.waypoints.initial_state, np.float32)[None], (B, 1)
        )
        x0[:, 3:6] += rng.normal(0, 1, (B, 3)).astype(np.float32)
        q = x0[:, 6:10] + 0.05 * rng.normal(0, 1, (B, 4)).astype(np.float32)
        x0[:, 6:10] = q / np.linalg.norm(q, axis=1, keepdims=True)
        us = rng.uniform(-1, 1, (B, N, 7)).astype(np.float32)
        us[:, :, 3:6] = 0.0

        kernel_rollout = make_fused_rollout(
            params, horizon=N, dt=dt, substeps=ss, interpret=True
        )
        xs_kernel = np.asarray(kernel_rollout(jnp.asarray(x0), jnp.asarray(us)))

        step = integrators.make_step_fn(params, substeps=ss, normalize="step")
        xs_ref = np.asarray(batch_rollout(step, jnp.asarray(x0), jnp.asarray(us), dt))

        assert xs_kernel.shape == xs_ref.shape == (B, N + 1, 13)
        np.testing.assert_allclose(xs_kernel, xs_ref, rtol=2e-4, atol=2e-4)

    def test_tiles_layout_matches_jnp_reference(self):
        """Full-tile layout (group*128 scenarios per grid step, MLP as
        SMEM scalar-broadcast FMAs) against the same jnp oracle."""
        from aircraft_tpu.kernels import make_fused_rollout_tiles

        params = make_params()
        B, N, dt, ss = 1024, 4, 0.01, 2
        rng = np.random.default_rng(5)
        x0 = np.tile(
            np.asarray(CFG.waypoints.initial_state, np.float32)[None], (B, 1)
        )
        x0[:, 3:6] += rng.normal(0, 1, (B, 3)).astype(np.float32)
        q = x0[:, 6:10] + 0.05 * rng.normal(0, 1, (B, 4)).astype(np.float32)
        x0[:, 6:10] = q / np.linalg.norm(q, axis=1, keepdims=True)
        us = rng.uniform(-1, 1, (B, N, 7)).astype(np.float32)
        us[:, :, 3:6] = 0.0

        roll = make_fused_rollout_tiles(
            params, horizon=N, dt=dt, substeps=ss, interpret=True
        )
        xs_kernel = np.asarray(roll(jnp.asarray(x0), jnp.asarray(us)))

        step = integrators.make_step_fn(params, substeps=ss, normalize="step")
        xs_ref = np.asarray(
            batch_rollout(step, jnp.asarray(x0), jnp.asarray(us), dt)
        )
        assert xs_kernel.shape == xs_ref.shape == (B, N + 1, 13)
        np.testing.assert_allclose(xs_kernel, xs_ref, rtol=2e-4, atol=2e-4)

    def test_batch_tiling(self):
        params = make_params()
        B, N = 256, 3
        x0 = jnp.tile(
            jnp.asarray(CFG.waypoints.initial_state, dtype=jnp.float32)[None], (B, 1)
        )
        us = jnp.zeros((B, N, 7))
        roll = make_fused_rollout(params, horizon=N, dt=0.01, interpret=True)
        xs = roll(x0, us)
        assert xs.shape == (B, N + 1, 13)
        # identical scenarios -> identical trajectories across tiles
        np.testing.assert_allclose(
            np.asarray(xs[0]), np.asarray(xs[200]), atol=1e-6
        )


class TestBatchedCholesky:
    def test_matches_jax_cho_solve(self):
        from aircraft_tpu.kernels import make_batched_cholesky_solve

        rng = np.random.default_rng(4)
        B, m, k = 256, 8, 9
        W = rng.normal(0, 1, (B, m, m)).astype(np.float32)
        A = np.einsum("bij,bkj->bik", W, W) / m + 2.0 * np.eye(m)[None]
        rhs = rng.normal(0, 1, (B, m, k)).astype(np.float32)

        solve = make_batched_cholesky_solve(m, k, interpret=True)
        X = np.asarray(solve(jnp.asarray(A.astype(np.float32)), jnp.asarray(rhs)))

        expected = np.stack([np.linalg.solve(A[b], rhs[b]) for b in range(B)])
        np.testing.assert_allclose(X, expected, rtol=2e-3, atol=2e-3)

    def test_residual_small(self):
        from aircraft_tpu.kernels import make_batched_cholesky_solve

        rng = np.random.default_rng(5)
        B, m, k = 128, 10, 1
        W = rng.normal(0, 1, (B, m, m)).astype(np.float32)
        A = (np.einsum("bij,bkj->bik", W, W) / m + np.eye(m)[None]).astype(np.float32)
        rhs = rng.normal(0, 1, (B, m, k)).astype(np.float32)
        solve = make_batched_cholesky_solve(m, k, interpret=True)
        X = np.asarray(solve(jnp.asarray(A), jnp.asarray(rhs)))
        res = np.einsum("bij,bjk->bik", A, X) - rhs
        assert np.abs(res).max() < 1e-2
