"""Tests: implicit integrator, MHE wind estimation, data preprocessing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aircraft_tpu.config import glider_config
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.solvers import integrators
from aircraft_tpu.solvers.rollout import rollout

CFG = glider_config()


def trim_state():
    return jnp.asarray(
        np.array([0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0], np.float32)
    )


class TestImplicitIntegrator:
    def test_matches_rk4_at_small_dt(self):
        params = AircraftParams.from_config(CFG.aircraft)
        x, u = trim_state(), jnp.zeros(7)
        dt = 1e-3
        x_exp = integrators.step(params, x, u, dt, normalize="step")
        x_imp = integrators.step_implicit(params, x, u, dt, normalize="step")
        # 1st-order implicit vs 4th-order RK4: agreement to O(dt²) only
        np.testing.assert_allclose(
            np.asarray(x_exp), np.asarray(x_imp), rtol=1e-3, atol=5e-3
        )

    def test_implicit_linear_decay_exact(self):
        """On ẋ = −a x the implicit fixed point is x/(1+a dt) — check the
        Newton iterations actually reach it."""
        a = 5.0
        f = lambda x, u: -a * x
        x0 = jnp.ones(3)
        x1 = integrators.implicit_euler_step(f, x0, jnp.zeros(1), 0.05, newton_iters=8)
        np.testing.assert_allclose(np.asarray(x1), 1.0 / (1 + a * 0.05), rtol=1e-5)

    def test_make_step_fn_dispatch(self):
        params = AircraftParams.from_config(CFG.aircraft)
        fn = integrators.make_step_fn(params, integration="implicit", normalize="step")
        x = fn(trim_state(), jnp.zeros(7), 0.01)
        assert np.all(np.isfinite(np.asarray(x)))

    def test_implicit_stable_and_advances_at_stiff_dt(self):
        """Regression for the round-2 fixed-point implementation: at
        dt = 0.05 the plain fixed-point iteration diverges on the stiff
        rotational dynamics (|eig| up to ~100 s⁻¹, dt·L > 1), which froze
        every implicit ablation case at its initial state.  The Newton
        solve must stay finite, bounded, and actually MOVE the aircraft."""
        params = AircraftParams.from_config(CFG.aircraft)
        step = integrators.make_step_fn(
            params, substeps=1, normalize="step", integration="implicit")
        xs = np.asarray(rollout(step, trim_state(), jnp.zeros((40, 7)), 0.05))
        assert np.all(np.isfinite(xs))
        assert np.abs(xs).max() < 1e4
        moved = np.linalg.norm(xs[-1, :3] - xs[0, :3])
        assert moved > 50.0, moved  # 2 s of ~50 m/s flight, not a freeze


class TestMHE:
    def test_recovers_injected_wind(self):
        from aircraft_tpu.control.mhe import estimate_wind
        from aircraft_tpu.dynamics import aircraft as ac

        params = AircraftParams.from_config(CFG.aircraft)
        true_wind = jnp.array([3.0, -2.0, 0.5])
        dt, W = 0.02, 20

        deriv = lambda x, u: ac.state_derivative(params, x, u, wind=true_wind)
        step = integrators.make_step_fn(
            params, substeps=2, normalize="step", derivative_fn=deriv
        )
        us = jnp.zeros((W, 7))
        xs = rollout(step, trim_state(), us, dt)

        result = estimate_wind(params, xs, us, jnp.asarray(dt), 2, 10)
        np.testing.assert_allclose(
            np.asarray(result.wind), np.asarray(true_wind), atol=0.2
        )
        assert float(result.residual) < 0.5

    def test_zero_wind_baseline(self):
        from aircraft_tpu.control.mhe import estimate_wind

        params = AircraftParams.from_config(CFG.aircraft)
        dt, W = 0.02, 15
        step = integrators.make_step_fn(params, substeps=2, normalize="step")
        us = jnp.zeros((W, 7))
        xs = rollout(step, trim_state(), us, dt)
        result = estimate_wind(params, xs, us, jnp.asarray(dt), 2, 8)
        assert np.linalg.norm(np.asarray(result.wind)) < 0.3


class TestPreprocess:
    def test_symmetry_augment(self):
        from aircraft_tpu.surrogates.preprocess import symmetry_augment

        x = np.array([[1000.0, 0.1, 0.2, 1.0, -2.0]], np.float32)
        y = np.array([[-0.05, 0.1, -0.5, 0.02, -0.1, 0.01]], np.float32)
        x2, y2 = symmetry_augment(x, y)
        assert x2.shape == (2, 5)
        np.testing.assert_allclose(x2[1, 2], -0.2)
        np.testing.assert_allclose(y2[1, 1], -0.1)
        np.testing.assert_allclose(y2[1, 3], -0.02)
        np.testing.assert_allclose(y2[1, 5], -0.01)
        np.testing.assert_allclose(y2[1, 0], -0.05)  # CX unchanged

    def test_wind_to_body_zero_angles(self):
        from aircraft_tpu.surrogates.preprocess import wind_to_body

        CX, CY, CZ = wind_to_body(
            np.array([0.05]), np.array([0.0]), np.array([0.5]),
            np.array([0.0]), np.array([0.0]),
        )
        np.testing.assert_allclose(CX, -0.05, atol=1e-9)  # drag backward
        np.testing.assert_allclose(CZ, -0.5, atol=1e-9)   # lift up (-z)

    def test_clean_drops_bad_rows(self):
        from aircraft_tpu.surrogates.preprocess import clean

        x = np.array(
            [[1000, 0.1, 0.0, 0, 0], [1000, 2.0, 0.0, 0, 0], [1000, 0.1, 0, 0, np.nan]],
            np.float32,
        )
        y = np.zeros((3, 6), np.float32)
        xc, yc = clean(x, y)
        assert xc.shape[0] == 1


class TestWindChannelMHTT:
    def test_wind_channels_constant_and_affect_dynamics(self):
        from aircraft_tpu.control.initialisation import DubinsInitialiser
        from aircraft_tpu.control.mhtt import build_mhtt_ocp

        cfg = glider_config()
        params = AircraftParams.from_config(cfg.aircraft)
        track = DubinsInitialiser(cfg)
        ocp = build_mhtt_ocp(
            params, cfg, track.track_points, track.length(), dt=0.02,
            substeps=2, wind_channels=True,
        )
        x = trim_state()
        z_calm = jnp.concatenate([x, jnp.zeros(1), jnp.zeros(3)])
        z_windy = jnp.concatenate([x, jnp.zeros(1), jnp.asarray([5.0, 0.0, 0.0])])
        u = jnp.zeros(7)
        out_calm = ocp.step(z_calm, u, 0)
        out_windy = ocp.step(z_windy, u, 0)
        # wind channels are constant under the dynamics
        np.testing.assert_allclose(np.asarray(out_windy[14:17]), [5.0, 0.0, 0.0])
        # and the wind changes the physical state evolution
        assert not np.allclose(np.asarray(out_calm[:13]), np.asarray(out_windy[:13]))
