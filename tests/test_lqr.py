"""Error-state LQR (solvers/lqr.py) — covers the reference's experimental
LQR wrapper (reference dynamics/base.py:41-76) with the quaternion handled
properly (tangent space instead of the raw 13-state, whose unit-norm
direction is an uncontrollable neutral mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aircraft_tpu.config import glider_config
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.ops import quaternion as quat
from aircraft_tpu.solvers import lqr, trim as trim_mod

CFG = glider_config()
RNG = np.random.default_rng(3)


class TestChart:
    def test_logmap_expmap_round_trip(self):
        phi = jnp.asarray(RNG.uniform(-1.5, 1.5, (64, 3)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(quat.logmap(quat.expmap(phi))), np.asarray(phi),
            atol=1e-5)

    def test_logmap_identity_and_small_angles(self):
        np.testing.assert_allclose(
            np.asarray(quat.logmap(quat.identity())), np.zeros(3), atol=1e-7)
        phi = jnp.asarray([[1e-8, -2e-8, 1e-8]], jnp.float32)
        out = np.asarray(quat.logmap(quat.expmap(phi)))
        assert np.all(np.isfinite(out))
        # differentiable at the identity
        g = jax.jacfwd(quat.logmap)(quat.identity() + 0.0)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_logmap_double_cover(self):
        """-q and q are the same rotation: logmap must agree."""
        phi = jnp.asarray(RNG.uniform(-1.0, 1.0, (16, 3)), jnp.float32)
        q = quat.expmap(phi)
        np.testing.assert_allclose(
            np.asarray(quat.logmap(-q)), np.asarray(quat.logmap(q)), atol=1e-5)

    def test_inject_retract_round_trip(self):
        x_ref = jnp.asarray([0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0],
                            jnp.float32)
        xi = jnp.asarray(RNG.uniform(-0.5, 0.5, 12), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(lqr.retract(lqr.inject(x_ref, xi), x_ref)),
            np.asarray(xi), atol=1e-5)


class TestDARE:
    def test_sda_matches_scipy(self):
        """Doubling iteration vs scipy.linalg.solve_discrete_are on random
        stabilisable systems, float64."""
        from scipy.linalg import solve_discrete_are

        for trial in range(5):
            rng = np.random.default_rng(trial)
            n, m = 8, 3
            A = rng.normal(0, 0.4, (n, n)) + 0.6 * np.eye(n)
            B = rng.normal(0, 1, (n, m))
            Q = np.eye(n)
            R = np.eye(m)
            P_ref = solve_discrete_are(A, B, Q, R)
            P = np.asarray(lqr.solve_dare(
                jnp.asarray(A), jnp.asarray(B), jnp.asarray(Q),
                jnp.asarray(R)))
            # float32 device arithmetic vs scipy float64
            np.testing.assert_allclose(P, P_ref, rtol=3e-5, atol=3e-5)

    def test_gain_stabilises(self):
        rng = np.random.default_rng(42)
        n, m = 6, 2
        A = rng.normal(0, 0.5, (n, n)) + 1.05 * np.eye(n)  # unstable
        B = rng.normal(0, 1, (n, m))
        K, _ = lqr.dare_gain(jnp.asarray(A), jnp.asarray(B),
                             jnp.eye(n), jnp.eye(m))
        cl = A - B @ np.asarray(K)
        assert np.abs(np.linalg.eigvals(cl)).max() < 1.0

    def test_continuous_lqr_parity(self):
        """Host CARE path (reference dynamics/base.py:60-66)."""
        rng = np.random.default_rng(7)
        n, m = 5, 2
        A = rng.normal(0, 1, (n, n))
        B = rng.normal(0, 1, (n, m))
        K, P = lqr.continuous_lqr(A, B, np.eye(n), np.eye(m))
        cl = np.linalg.eigvals(A - B @ K)
        assert np.all(cl.real < 0)


class TestGliderLQR:
    @pytest.fixture(scope="class")
    def ctrl_setup(self):
        params_trim = AircraftParams.from_config(CFG.aircraft,
                                                 com_in_control=True)
        res = trim_mod.multistart_trim(params_trim, jax.random.PRNGKey(0),
                                       n_starts=64, target_airspeed=50.0)
        assert float(res.residual) < 1e-2
        # freeze the trimmed CoM into the plant; plain 7-channel control
        params = AircraftParams.from_config(CFG.aircraft).replace(
            com=res.control[7:10])
        u_ref = res.control[:7]
        ctrl = lqr.design(params, res.state, u_ref, dt=0.01, substeps=2)
        return params, ctrl

    def test_closed_loop_spectral_radius(self, ctrl_setup):
        """Position modes sit exactly on the unit circle BY DESIGN (zero Q
        weight on the translation-invariant states); everything else must
        be strictly inside it and better than open loop."""
        _, ctrl = ctrl_setup
        cl = np.asarray(ctrl.A) - np.asarray(ctrl.B) @ np.asarray(ctrl.K)
        mags = np.sort(np.abs(np.linalg.eigvals(cl.astype(np.float64))))[::-1]
        np.testing.assert_allclose(mags[:3], 1.0, atol=1e-3)  # 3 position modes
        assert mags[3] < 1.0, mags
        rho_ol = np.sort(np.abs(np.linalg.eigvals(
            np.asarray(ctrl.A, dtype=np.float64))))[::-1]
        assert mags[3] < rho_ol[0]  # strictly better than open loop

    def test_stabilises_perturbed_flight(self, ctrl_setup):
        """2 s closed loop from an attitude+rate-perturbed start: the
        (position-free) error must shrink well below its initial value;
        the open-loop plant diverges from the same start."""
        params, ctrl = ctrl_setup
        xi0 = jnp.zeros(12, jnp.float32)
        xi0 = xi0.at[3:6].set(jnp.asarray([2.0, 1.0, -1.0]))
        xi0 = xi0.at[6:9].set(jnp.asarray([0.15, -0.1, 0.1]))
        xi0 = xi0.at[9:12].set(jnp.asarray([0.3, -0.2, 0.2]))
        x0 = lqr.inject(ctrl.x_ref, xi0)

        step = lqr.closed_loop_step(params, ctrl, dt=0.01, substeps=2)
        _, traj = jax.lax.scan(step, x0, None, length=200)

        def err(x):
            xi = np.asarray(lqr.retract(jnp.asarray(x), ctrl.x_ref))
            return np.linalg.norm(xi[..., 3:])  # ignore position drift

        e0, eT = err(x0), err(traj[-1])
        assert np.all(np.isfinite(np.asarray(traj)))
        assert eT < 0.2 * e0, (e0, eT)

        # same start, frozen trim control: open loop must do worse
        from aircraft_tpu.solvers import integrators

        def ol_step(x, _):
            xn = integrators.step(params, x, ctrl.u_ref, 0.01, substeps=2,
                                  normalize="step")
            return xn, xn

        _, ol_traj = jax.lax.scan(ol_step, x0, None, length=200)
        e_ol = err(ol_traj[-1]) if np.all(np.isfinite(np.asarray(
            ol_traj[-1]))) else np.inf
        assert eT < e_ol

    def test_control_broadcasts(self, ctrl_setup):
        _, ctrl = ctrl_setup
        xs = jnp.tile(ctrl.x_ref[None], (8, 1))
        us = lqr.control(ctrl, xs)
        assert us.shape == (8, 7)
        np.testing.assert_allclose(np.asarray(us),
                                   np.tile(np.asarray(ctrl.u_ref)[None], (8, 1)),
                                   atol=1e-5)
