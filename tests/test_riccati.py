"""Sequential vs associative-scan Riccati equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aircraft_tpu.solvers import riccati

RNG = np.random.default_rng(9)


def random_lq_problem(N, n, m, with_cross=True, with_linear=True):
    A = (np.eye(n) + 0.05 * RNG.normal(0, 1, (N, n, n))).astype(np.float32)
    B = 0.1 * RNG.normal(0, 1, (N, n, m)).astype(np.float32)
    # PSD stage costs
    W = RNG.normal(0, 1, (N, n, n)).astype(np.float32)
    lxx = (np.einsum("kij,klj->kil", W, W) / n + np.eye(n)[None]).astype(np.float32)
    Wu = RNG.normal(0, 1, (N, m, m)).astype(np.float32)
    luu = (np.einsum("kij,klj->kil", Wu, Wu) / m + np.eye(m)[None]).astype(np.float32)
    lux = (0.1 * RNG.normal(0, 1, (N, m, n)) if with_cross else np.zeros((N, m, n))).astype(np.float32)
    lx = (RNG.normal(0, 1, (N, n)) if with_linear else np.zeros((N, n))).astype(np.float32)
    lu = (RNG.normal(0, 1, (N, m)) if with_linear else np.zeros((N, m))).astype(np.float32)
    vx = RNG.normal(0, 1, n).astype(np.float32)
    Wt = RNG.normal(0, 1, (n, n)).astype(np.float32)
    vxx = (Wt @ Wt.T / n + np.eye(n)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (A, B, lx, lu, lxx, luu, lux, vx, vxx))


@pytest.mark.parametrize("N,n,m", [(8, 4, 2), (33, 13, 7), (64, 6, 3)])
def test_associative_matches_sequential(N, n, m):
    prob = random_lq_problem(N, n, m)
    reg = jnp.asarray(1e-6)
    K_s, k_s, _, _, _, fail_s = riccati.backward_sequential(*prob, reg)
    K_a, k_a, _, _, _, fail_a = riccati.backward_associative(*prob, reg)
    assert not bool(fail_s) and not bool(fail_a)
    np.testing.assert_allclose(np.asarray(K_a), np.asarray(K_s), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(k_a), np.asarray(k_s), rtol=2e-3, atol=2e-3)


def test_no_cross_no_linear():
    prob = random_lq_problem(16, 5, 2, with_cross=False, with_linear=False)
    reg = jnp.asarray(1e-6)
    K_s, k_s, *_ = riccati.backward_sequential(*prob, reg)
    K_a, k_a, *_ = riccati.backward_associative(*prob, reg)
    np.testing.assert_allclose(np.asarray(K_a), np.asarray(K_s), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(k_a), np.asarray(k_s), atol=1e-4)


class TestPallasCholInSweep:
    """The batched-Cholesky Pallas kernel wired into the Riccati sweep via
    custom_vmap (enable_pallas_chol): vmapped solves must match the XLA
    path (interpret mode stands in for the TPU on CPU)."""

    def test_vmapped_backward_matches_xla_path(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from aircraft_tpu.solvers import riccati

        rng = np.random.default_rng(3)
        Bsz, N, n, m = 3, 6, 5, 3

        def make(b):
            A = jnp.asarray(rng.normal(0, 0.3, (N, n, n)) + np.eye(n), jnp.float32)
            Bm = jnp.asarray(rng.normal(0, 0.3, (N, n, m)), jnp.float32)
            lx = jnp.asarray(rng.normal(0, 1, (N, n)), jnp.float32)
            lu = jnp.asarray(rng.normal(0, 1, (N, m)), jnp.float32)
            W = rng.normal(0, 1, (N, n, n))
            lxx = jnp.asarray(np.einsum("kij,klj->kil", W, W) / n + np.eye(n), jnp.float32)
            Wu = rng.normal(0, 1, (N, m, m))
            luu = jnp.asarray(np.einsum("kij,klj->kil", Wu, Wu) / m + np.eye(m), jnp.float32)
            lux = jnp.asarray(rng.normal(0, 0.1, (N, m, n)), jnp.float32)
            vx = jnp.asarray(rng.normal(0, 1, (n,)), jnp.float32)
            vxx = jnp.asarray(np.eye(n), jnp.float32)
            return A, Bm, lx, lu, lxx, luu, lux, vx, vxx

        batches = [make(b) for b in range(Bsz)]
        stacked = tuple(jnp.stack([b[i] for b in batches]) for i in range(9))
        regs = jnp.full((Bsz,), 1e-6, jnp.float32)

        def sweep(args, reg):
            return riccati.backward_sequential(*args, reg)

        try:
            riccati.enable_pallas_chol(False)
            K0, k0, *_ = jax.vmap(sweep)(stacked, regs)
            riccati.enable_pallas_chol(True, interpret=True)
            K1, k1, *_ = jax.vmap(sweep)(stacked, regs)
        finally:
            riccati.enable_pallas_chol(False)
        np.testing.assert_allclose(np.asarray(K1), np.asarray(K0), atol=2e-3)
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k0), atol=2e-3)


class TestSequenceParallel:
    """Horizon-sharded sweep over the 8-device mesh (parallel/seq_riccati)."""

    def test_identity_element(self):
        from aircraft_tpu.parallel.seq_riccati import backward_associative_sharded  # noqa: F401
        from aircraft_tpu.solvers.riccati import cv_combine, cv_identity

        prob = random_lq_problem(4, 5, 2)
        elems, _ = riccati.cv_elements(*prob[:7], jnp.asarray(1e-6))
        e0 = jax.tree_util.tree_map(lambda x: x[0], elems)
        ident = cv_identity(5, jnp.float32)
        for a, b in zip(cv_combine(ident, e0), e0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        for a, b in zip(cv_combine(e0, ident), e0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    @pytest.mark.parametrize("N,n,m", [(64, 6, 3), (32, 13, 7)])
    def test_sharded_matches_sequential(self, N, n, m):
        from aircraft_tpu.parallel.seq_riccati import (
            backward_associative_sharded, make_seq_mesh)

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device mesh")
        mesh = make_seq_mesh(8)
        prob = random_lq_problem(N, n, m)
        reg = jnp.asarray(1e-6, jnp.float32)
        K_s, k_s, dv1_s, dv2_s, qu_s, fail_s = riccati.backward_sequential(*prob, reg)
        K_p, k_p, dv1_p, dv2_p, qu_p, fail_p = jax.jit(
            lambda *a: backward_associative_sharded(mesh, *a)
        )(*prob, reg)
        assert not bool(fail_s) and not bool(fail_p)
        np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_s), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_s), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(float(dv1_p), float(dv1_s), rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(float(qu_p), float(qu_s), rtol=1e-2)
        # outputs really are sharded over the horizon
        assert K_p.sharding.is_equivalent_to(
            jax.NamedSharding(mesh, jax.sharding.PartitionSpec("sp")), K_p.ndim)
