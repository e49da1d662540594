"""Trim + stability tests (reference main/stability/{trim,stability}.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import glider_config
from aircraft_tpu.dynamics import aircraft as ac
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.solvers import trim as trim_mod

CFG = glider_config()


def make_params():
    return AircraftParams.from_config(CFG.aircraft, com_in_control=True)


class TestTrim:
    def test_multistart_trim_converges(self):
        params = make_params()
        result = trim_mod.multistart_trim(
            params, jax.random.PRNGKey(0), n_starts=64, target_airspeed=50.0
        )
        assert float(result.residual) < 1e-2, float(result.residual)
        # trimmed state: v̇ and ω̇ near zero
        xdot = ac.state_derivative(params, result.state, result.control)
        assert np.linalg.norm(np.asarray(xdot[3:6])) < 5e-2
        assert np.linalg.norm(np.asarray(xdot[10:13])) < 5e-2
        # airspeed close to target
        speed = float(jnp.linalg.norm(result.state[3:6]))
        assert abs(speed - 50.0) < 2.0, speed

    def test_trim_is_steady_glide(self):
        """A glider with no thrust must descend at trim (positive z-velocity
        in NED) — energy balance sanity check."""
        params = make_params()
        result = trim_mod.multistart_trim(
            params, jax.random.PRNGKey(1), n_starts=64, target_airspeed=50.0
        )
        assert float(result.residual) < 1e-2
        vz = float(result.state[5])
        assert vz > 0.0, f"glider should sink at trim, got vz={vz}"


class TestStability:
    def test_eigenvalues_finite_and_mode_structure(self):
        params = make_params()
        result = trim_mod.multistart_trim(
            params, jax.random.PRNGKey(0), n_starts=64, target_airspeed=50.0
        )
        eig = trim_mod.stability_eigenvalues(params, result.state, result.control)
        assert np.all(np.isfinite(eig))
        # position states contribute 3 zero eigenvalues (translation invariance)
        n_zero = np.sum(np.abs(eig) < 1e-4)
        assert n_zero >= 3

    def test_jacobian_shapes(self):
        params = make_params()
        x = jnp.asarray(np.array([0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0], np.float32))
        u = jnp.zeros(10)
        A, B = trim_mod.continuous_jacobians(params, x, u)
        assert A.shape == (13, 13) and B.shape == (13, 10)
        assert np.all(np.isfinite(np.asarray(A)))
        assert np.all(np.isfinite(np.asarray(B)))
