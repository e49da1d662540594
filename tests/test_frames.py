"""Stability/wind frames and rotating-Earth fictitious accelerations.

Covers the live role of the reference's dead-code numpy plant
(reference src/aircraft/dynamics/numpydynamics.py:160-210 Earth rotation,
:306-321 frame transforms): transforms verified against the defining
property (wind x-axis along the relative airflow), Earth terms against
hand-computed cross products at the equator/pole."""

import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import glider_config
from aircraft_tpu.dynamics import base, frames
from aircraft_tpu.dynamics import aircraft as ac
from aircraft_tpu.dynamics.aircraft import AircraftParams

RNG = np.random.default_rng(7)


def random_airflow(n):
    """Body-frame relative-velocity vectors with forward-dominant flow."""
    v = RNG.normal(0, 5, (n, 3))
    v[:, 0] = RNG.uniform(25, 60, n)
    return jnp.asarray(v, dtype=jnp.float32)


def aero_angles(v):
    alpha = jnp.arctan2(v[..., 2], v[..., 0])
    beta = jnp.arcsin(v[..., 1] / jnp.linalg.norm(v, axis=-1))
    return alpha, beta


class TestFrames:
    def test_wind_x_axis_is_airspeed(self):
        """The defining property: the relative-airflow vector expressed in
        the wind frame is [V, 0, 0]."""
        v = random_airflow(64)
        alpha, beta = aero_angles(v)
        w = frames.body_to_wind(v, alpha, beta)
        V = jnp.linalg.norm(v, axis=-1)
        np.testing.assert_allclose(np.asarray(w[..., 0]), np.asarray(V), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(w[..., 1:]), 0.0, atol=1e-4)

    def test_stability_zeroes_z_component(self):
        """Stability frame: airflow has no z-component (x_s = V cos beta,
        y_s = V sin beta, z_s = 0)."""
        v = random_airflow(64)
        alpha, beta = aero_angles(v)
        s = frames.body_to_stability(v, alpha)
        V = jnp.linalg.norm(v, axis=-1)
        np.testing.assert_allclose(
            np.asarray(s[..., 0]), np.asarray(V * jnp.cos(beta)), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s[..., 2]), 0.0, atol=1e-4)

    def test_round_trips(self):
        v = jnp.asarray(RNG.normal(0, 10, (32, 3)), dtype=jnp.float32)
        alpha = jnp.asarray(RNG.uniform(-0.4, 0.4, 32), dtype=jnp.float32)
        beta = jnp.asarray(RNG.uniform(-0.3, 0.3, 32), dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(frames.stability_to_body(frames.body_to_stability(v, alpha), alpha)),
            np.asarray(v), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(frames.wind_to_body(frames.body_to_wind(v, alpha, beta), alpha, beta)),
            np.asarray(v), atol=1e-5)

    def test_zero_angles_identity(self):
        v = jnp.asarray([[1.0, 2.0, 3.0]])
        z = jnp.zeros(1)
        np.testing.assert_allclose(np.asarray(frames.body_to_wind(v, z, z)), np.asarray(v))

    def test_transforms_are_rotations(self):
        """Norm preservation (pure rotations, no reflection/scale)."""
        v = jnp.asarray(RNG.normal(0, 10, (32, 3)), dtype=jnp.float32)
        alpha = jnp.asarray(RNG.uniform(-1, 1, 32), dtype=jnp.float32)
        beta = jnp.asarray(RNG.uniform(-1, 1, 32), dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(frames.body_to_wind(v, alpha, beta), axis=-1)),
            np.asarray(jnp.linalg.norm(v, axis=-1)), rtol=1e-5)


class TestEarthRotation:
    def test_coriolis_eastward_at_equator(self):
        """Moving east at the equator: -2 Omega x v points up (Eotvos
        effect).  Omega_NED = [w, 0, 0], v = [0, v, 0] ->
        -2 w v (x_hat cross y_hat) = -2 w v z_hat, i.e. negative z = up."""
        earth = frames.EarthRotationParams.at_latitude(0.0)
        v = jnp.asarray([0.0, 50.0, 0.0])
        a = np.asarray(frames.coriolis_acceleration(earth, v))
        expected_up = 2 * frames.OMEGA_EARTH * 50.0
        np.testing.assert_allclose(a, [0.0, 0.0, -expected_up], atol=1e-9)

    def test_coriolis_matches_numpy_cross(self):
        earth = frames.EarthRotationParams.at_latitude(47.0)
        v = RNG.normal(0, 30, (16, 3))
        ours = np.asarray(frames.coriolis_acceleration(earth, jnp.asarray(v, jnp.float32)))
        omega = np.asarray(earth.rate_ned)
        theirs = -2.0 * np.cross(np.broadcast_to(omega, v.shape), v)
        np.testing.assert_allclose(ours, theirs, atol=1e-8)

    def test_centrifugal_points_up_at_equator(self):
        """|a_cf| = w^2 R ~ 3.4e-2 m/s^2, directed away from the spin axis
        (locally up at the equator)."""
        earth = frames.EarthRotationParams.at_latitude(0.0)
        p = jnp.zeros(3)
        a = np.asarray(frames.centrifugal_acceleration(earth, p))
        mag = frames.OMEGA_EARTH**2 * frames.R_EARTH
        np.testing.assert_allclose(a, [0.0, 0.0, -mag], atol=1e-9)
        assert 0.03 < mag < 0.04

    def test_centrifugal_vanishes_at_pole(self):
        earth = frames.EarthRotationParams.at_latitude(90.0)
        a = np.asarray(frames.centrifugal_acceleration(earth, jnp.zeros(3)))
        np.testing.assert_allclose(a, 0.0, atol=1e-7)

    def test_wrapper_touches_only_velocity_block(self):
        cfg = glider_config()
        params = AircraftParams.from_config(cfg.aircraft)
        earth = frames.EarthRotationParams.at_latitude(45.0)
        x = jnp.asarray([0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0], jnp.float32)
        u = jnp.zeros(7, jnp.float32)
        plain = ac.state_derivative(params, x, u)
        wrapped = frames.with_earth_rotation(ac.state_derivative, earth)(params, x, u)
        diff = np.asarray(wrapped - plain)
        # default wrapper adds Coriolis only — the plant's 9.81 standard
        # gravity already contains the centrifugal relief
        expected = np.asarray(frames.coriolis_acceleration(earth, x[base.VEL]))
        np.testing.assert_allclose(diff[3:6], expected, atol=1e-6)
        np.testing.assert_allclose(diff[:3], 0.0, atol=1e-7)
        np.testing.assert_allclose(diff[6:], 0.0, atol=1e-7)
        # sanity: the correction is small (mm/s^2-to-cm/s^2 scale) so the
        # main plant is right to omit it, matching the reference
        assert np.all(np.abs(expected) < 0.1)

        # opt-in centrifugal path (for gravitation-based gravity vectors)
        wrapped_cf = frames.with_earth_rotation(
            ac.state_derivative, earth, include_centrifugal=True)(params, x, u)
        expected_cf = np.asarray(
            frames.fictitious_acceleration(earth, x[base.POS], x[base.VEL]))
        np.testing.assert_allclose(
            np.asarray(wrapped_cf - plain)[3:6], expected_cf, atol=1e-6)
