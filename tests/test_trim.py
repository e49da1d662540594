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


class TestDiscreteStability:
    """Discrete step-map spectral analysis
    (reference main/stability/stability.py:47-148)."""

    def test_discrete_jacobian_consistent_with_continuous(self):
        """For small dt, A_d ~ I + dt*A_c (first-order agreement)."""
        params = make_params()
        x = jnp.asarray(
            np.array([0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0], np.float32))
        u = jnp.zeros(10, jnp.float32)
        dt = 1e-4
        A_d, B_d = trim_mod.discrete_jacobians(params, x, u, dt)
        A_c, B_c = trim_mod.continuous_jacobians(params, x, u)
        # atol 5e-4: the residual is the O(dt^2 |A|^2) RK4 term
        np.testing.assert_allclose(
            np.asarray(A_d), np.eye(13) + dt * np.asarray(A_c),
            atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(B_d), dt * np.asarray(B_c), atol=5e-4)

    def test_perturbation_study(self):
        """Spectral radii stay near 1 for dt=0.01 at flyable speed, and the
        dt sweep shows instability growing with timestep (the reference's
        max-eigenvalue-vs-dt panel, stability.py:139-148)."""
        params = make_params()
        x = np.array([0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0], np.float32)
        u = np.zeros(10, np.float32)
        report = trim_mod.discrete_stability_analysis(
            params, x, u, dt=0.01, n_perturb=9)
        assert report.eigenvalues.shape == (9, 13)
        assert np.all(np.isfinite(report.spectral_radius))
        assert np.all(np.isfinite(report.condition_numbers))
        # near-unit spectral radius at dt=0.01 (unstable plant, but slowly:
        # modes grow a few percent per step at most)
        assert np.all(report.spectral_radius < 1.5)
        assert np.all(report.spectral_radius > 0.5)
        # dt sweep: monotone-ish growth of instability with timestep —
        # largest dt must be worse than smallest
        assert report.dt_spectral_radius[-1] > report.dt_spectral_radius[0]
        # tiny dt: step map approaches identity
        np.testing.assert_allclose(report.dt_spectral_radius[0], 1.0, atol=0.05)


class TestRescueTierTrim:
    """The glide-ladder rescue tier of multistart_trim (round-4): plants
    whose only equilibria live in steep corners of the envelope must still
    trim.  Root-caused on the affine model (the reference's own
    data/glider/linearised.csv coefficients, byte-equal in
    data/networks/linearised.csv): its sole longitudinal equilibrium inside
    the ±5 elevator box is a γ≈30–40° dive at L/D < 2 — every near-level
    random start parks at a clipped-elevator corner with residual ~1, which
    stalled the warm-start rollout of all 17 failing linear ablation rows
    (round-3 verdict #3)."""

    def test_linear_plant_trims_in_dive_corner(self):
        import jax

        from aircraft_tpu.config import glider_config
        from aircraft_tpu.dynamics.aircraft import AircraftParams
        from aircraft_tpu.dynamics.coefficients import default_artifact_coeff

        cfg = glider_config()
        params = AircraftParams.from_config(
            cfg.aircraft, coeff=default_artifact_coeff("linear"))
        t = trim_mod.multistart_trim(params, jax.random.PRNGKey(0),
                                     n_starts=8, target_airspeed=30.0)
        assert float(t.residual) < 1e-3, float(t.residual)
        vel = np.asarray(t.state)[3:6]
        gamma = np.arctan2(vel[2], np.hypot(vel[0], vel[1]))
        # the equilibrium IS a steep dive — the model property, documented
        assert np.degrees(gamma) > 20.0, np.degrees(gamma)

    def test_rescue_tier_not_entered_for_healthy_plants(self):
        """The default plant converges in tier 1 (speed-penalized random
        multistart) — the rescue tier must not perturb its selection: trim
        sits at the requested speed with near-zero residual."""
        import jax

        from aircraft_tpu.config import glider_config
        from aircraft_tpu.dynamics.aircraft import AircraftParams

        cfg = glider_config()
        params = AircraftParams.from_config(cfg.aircraft)
        t = trim_mod.multistart_trim(params, jax.random.PRNGKey(0),
                                     n_starts=8, target_airspeed=30.0)
        assert float(t.residual) < 1e-3
        speed = float(np.linalg.norm(np.asarray(t.state)[3:6]))
        assert abs(speed - 30.0) < 0.5, speed
