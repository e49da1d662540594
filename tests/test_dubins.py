"""Property tests for the Dubins planners: every produced path must actually
arrive at the requested configuration when integrated (stronger than the
reference's visual ✓/✗ scripts, reference main/initialisation/dubins.py)."""

import numpy as np
import pytest

from aircraft_tpu.dubins.dubins2d import shortest_path
from aircraft_tpu.dubins.dubins3d import maneuver3d

RNG = np.random.default_rng(7)


def angdiff(a, b):
    return np.abs(np.arctan2(np.sin(a - b), np.cos(a - b)))


class TestDubins2D:
    def test_endpoints_random(self):
        for _ in range(200):
            qi = np.array([*RNG.uniform(-50, 50, 2), RNG.uniform(0, 2 * np.pi)])
            qf = np.array([*RNG.uniform(-50, 50, 2), RNG.uniform(0, 2 * np.pi)])
            rho = RNG.uniform(1.0, 10.0)
            path = shortest_path(qi, qf, rho)
            assert path is not None, (qi, qf, rho)
            end = path.sample(path.length)
            assert np.linalg.norm(end[:2] - qf[:2]) < 1e-6 * max(1, path.length), (
                path.word, end, qf
            )
            assert angdiff(end[2], qf[2]) < 1e-6

    def test_start_configuration(self):
        qi = np.array([3.0, -2.0, 0.7])
        qf = np.array([20.0, 15.0, 2.2])
        path = shortest_path(qi, qf, 5.0)
        start = path.sample(0.0)
        np.testing.assert_allclose(start, qi, atol=1e-9)

    def test_length_lower_bound(self):
        """Path length >= straight-line distance."""
        for _ in range(100):
            qi = np.array([*RNG.uniform(-50, 50, 2), RNG.uniform(0, 2 * np.pi)])
            qf = np.array([*RNG.uniform(-50, 50, 2), RNG.uniform(0, 2 * np.pi)])
            path = shortest_path(qi, qf, 3.0)
            assert path.length >= np.linalg.norm(qf[:2] - qi[:2]) - 1e-9

    def test_min_length_respected(self):
        qi = np.array([0.0, 0.0, 0.0])
        qf = np.array([30.0, 0.0, 0.0])
        unconstrained = shortest_path(qi, qf, 3.0)
        constrained = shortest_path(qi, qf, 3.0, min_length=50.0)
        assert unconstrained.length < 50.0
        if constrained is not None:
            assert constrained.length >= 50.0 - 1e-9

    def test_straight_degenerate(self):
        path = shortest_path([0, 0, 0], [100, 0, 0], 5.0)
        assert abs(path.length - 100.0) < 1e-6

    def test_sampling_continuity(self):
        path = shortest_path([0, 0, 1.0], [40, 25, 4.0], 6.0)
        pts = path.sample_many(200)
        step = np.linalg.norm(np.diff(pts[:, :2], axis=0), axis=1)
        expected = path.length / 199
        assert np.all(step < expected * 1.5 + 1e-9)


class TestDubins3D:
    def test_endpoint_accuracy(self):
        hits = 0
        for _ in range(40):
            qi = np.array([0.0, 0.0, -200.0, RNG.uniform(0, 2 * np.pi), 0.0])
            qf = np.array(
                [
                    *RNG.uniform(-150, 150, 2),
                    -200.0 + RNG.uniform(-15, 15),
                    RNG.uniform(0, 2 * np.pi),
                    0.0,
                ]
            )
            m = maneuver3d(qi, qf, rho=20.0)
            if m is None:
                continue
            hits += 1
            end = m.sample(m.length)
            assert np.linalg.norm(end[:3] - qf[:3]) < 0.5, (end, qf)
        assert hits > 20  # most scenarios must be solvable

    def test_pitch_limits_respected(self):
        qi = np.array([0.0, 0.0, -200.0, 0.0, 0.0])
        qf = np.array([200.0, 50.0, -180.0, np.pi / 2, 0.0])
        lim = np.deg2rad(12.0)
        m = maneuver3d(qi, qf, rho=20.0, pitch_limits=(-lim, lim))
        assert m is not None
        pts = m.sample_many(128)
        dz = np.diff(pts[:, 2])
        dxy = np.linalg.norm(np.diff(pts[:, :2], axis=0), axis=1)
        gam = np.arctan2(dz, np.maximum(dxy, 1e-9))
        assert np.all(np.abs(gam) < lim + 0.05)


class TestInitialiser:
    def test_glider_track(self):
        import jax.numpy as jnp

        from aircraft_tpu.config import glider_config
        from aircraft_tpu.control.initialisation import DubinsInitialiser

        init = DubinsInitialiser(glider_config())
        L = init.length()
        assert L > 300.0  # the there-and-back course is several hundred meters

        # track endpoints hit first/last waypoints
        wps = glider_config().waypoints.all_points()
        p0 = np.asarray(init.eval(0.0))
        p1 = np.asarray(init.eval(1.0))
        assert np.linalg.norm(p0 - wps[0]) < 2.0
        assert np.linalg.norm(p1 - wps[-1]) < 2.0

        # tangent magnitude ~ total length (ds-normalised parameterisation)
        tan = np.asarray(init.eval_tangent(jnp.linspace(0.05, 0.95, 16)))
        mags = np.linalg.norm(tan, axis=-1)
        assert np.all(mags > 0.3 * L) and np.all(mags < 3.0 * L)

    def test_state_guess_shape_and_sanity(self):
        from aircraft_tpu.config import glider_config
        from aircraft_tpu.control.initialisation import DubinsInitialiser

        init = DubinsInitialiser(glider_config())
        guess = init.state_guess(50)
        assert guess.shape == (51, 13)
        assert np.all(np.isfinite(guess))
        # unit quaternions
        norms = np.linalg.norm(guess[:, 6:10], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # speed near default velocity
        speeds = np.linalg.norm(guess[:, 3:6], axis=1)
        np.testing.assert_allclose(speeds, init.speed, rtol=1e-3)


class TestDubins3DBounds:
    """Length-bound estimates (reference dubins3d.py:154-230)."""

    def test_bounds_bracket_constructed_maneuver(self):
        from aircraft_tpu.dubins.dubins3d import lower_bound, upper_bound

        rng = np.random.default_rng(11)
        pitch = (-np.deg2rad(20.0), np.deg2rad(20.0))
        rho = 40.0
        checked = 0
        for _ in range(20):
            qi = np.array([0, 0, 0, rng.uniform(-np.pi, np.pi), 0.0])
            qf = np.array([rng.uniform(300, 900), rng.uniform(-400, 400),
                           rng.uniform(-60, 60),
                           rng.uniform(-np.pi, np.pi), 0.0])
            m = maneuver3d(qi, qf, rho, pitch)
            if m is None:
                continue
            lb = lower_bound(qi, qf, rho, pitch)
            ub = upper_bound(qi, qf, rho, pitch)
            # small tolerance: bounds and maneuver use finite samplings
            assert lb <= m.length * 1.01 + 1e-6, (lb, m.length)
            if np.isfinite(ub):
                assert ub * 1.01 + 1e-6 >= m.length, (ub, m.length)
                assert ub >= lb
            checked += 1
        assert checked >= 10

    def test_upper_bound_inf_when_too_close(self):
        from aircraft_tpu.dubins.dubins3d import upper_bound

        qi = np.array([0, 0, 0, 0, 0.0])
        qf = np.array([10.0, 0, 0, 0, 0.0])  # within 4*sqrt(2)*rho
        assert upper_bound(qi, qf, rho=40.0) == float("inf")

    def test_lower_bound_at_most_straight_distance_plus_turns(self):
        """For a long straight-ahead transfer the lower bound approaches the
        Euclidean distance."""
        from aircraft_tpu.dubins.dubins3d import lower_bound

        qi = np.array([0, 0, 0, 0, 0.0])
        qf = np.array([2000.0, 0, 0, 0, 0.0])
        lb = lower_bound(qi, qf, rho=40.0)
        assert 1999.0 <= lb <= 2010.0, lb


class TestReferenceScenarios:
    """Differential coverage against the reference's own 3D scenario suite
    (reference main/initialisation/dubins.py:21-80) plus steep
    climb/descent cases.  Expected lengths were recorded by RUNNING the
    reference implementation on each scenario (DubinsManeuver3D_constructor
    + compute_sampling); the repo's radius search must find a maneuver of
    comparable length (within 2%, usually shorter after local refinement)
    that hits the endpoint and honours the pitch envelope exactly."""

    SCENARIOS = [
        # (name, qi, qf, rho, pitch_limits, reference_length)
        ("basic", [0, 0, 0, 0, 0],
         [10, 10, 5, np.pi / 2, np.pi / 6], 2.0,
         (-np.pi / 4, np.pi / 3), 15.359),
        ("ascending_turn", [0, 0, 0, 0, 0],
         [5, 5, 3, np.pi / 2, np.pi / 6], 1.5,
         (-np.pi / 6, np.pi / 3), 7.961),
        ("descending_turn", [0, 0, 5, 0, 0],
         [8, -3, 1, -np.pi / 3, -np.pi / 8], 2.0,
         (-np.pi / 4, np.pi / 4), 9.632),
        ("level_heading_change", [0, 0, 2, 0, 0],
         [6, 4, 2, np.pi, 0], 1.0,
         (-np.pi / 6, np.pi / 6), 9.466),
        ("steep_climb", [0, 0, 0, 0, 0],
         [3, 3, 8, np.pi / 4, np.pi / 3], 1.5,
         (-np.pi / 6, np.pi / 2), 9.623),
        ("steep_descent", [0, 0, 0, np.pi / 4, 0.2],
         [6, -4, -9, 3.0, -0.3], 1.5,
         (-np.pi / 4, np.pi / 2), 15.405),
    ]

    def test_matches_reference_feasibility_and_length(self):
        for name, qi, qf, rho, lims, ref_len in self.SCENARIOS:
            m = maneuver3d(np.asarray(qi, float), np.asarray(qf, float),
                           rho, pitch_limits=lims, n_radius_search=24)
            assert m is not None, name
            end = m.sample(m.length)
            assert np.linalg.norm(end[:3] - np.asarray(qf[:3])) < 1e-6, name
            assert m.length <= ref_len * 1.02, (name, m.length, ref_len)
            # pitch envelope honoured everywhere (dense sampling)
            pts = m.sample_many(256)
            dz = np.diff(pts[:, 2])
            dxy = np.linalg.norm(np.diff(pts[:, :2], axis=0), axis=1)
            gam = np.arctan2(dz, np.maximum(dxy, 1e-12))
            assert gam.min() > lims[0] - 0.05 and gam.max() < lims[1] + 0.05, name


class TestVerticalCSC:
    """Pitch-constrained vertical CSC construction (dubins/vertical.py —
    the reference Vertical's role, reference vertical.py:9-113)."""

    def test_exact_profile_when_slope_fits(self):
        from aircraft_tpu.dubins.vertical import vertical_profile

        lims = (-np.deg2rad(20), np.deg2rad(20))
        m = vertical_profile([0.0, 0.0, 0.0], [100.0, 10.0, 0.0], 30.0, lims)
        assert m is not None and m.exact
        end = m.sample(m.length)
        np.testing.assert_allclose(end, [100.0, 10.0, 0.0], atol=1e-6)
        lo, hi = m.pitch_range()
        assert lims[0] - 1e-9 <= lo and hi <= lims[1] + 1e-9

    def test_clamped_profile_on_steep_transfer(self):
        """A climb steeper than the envelope slope: the exact CSC would
        need θ > pitch_max, so the construction clamps the straight to the
        boundary (reference vertical.py:169-215 `_LSR` clamped branch) —
        Δz and γ endpoints matched exactly, abscissa approximate, pitch
        within the envelope everywhere."""
        from aircraft_tpu.dubins.vertical import vertical_profile

        lims = (-np.deg2rad(15), np.deg2rad(15))
        m = vertical_profile([0.0, 0.0, 0.0], [40.0, 30.0, 0.0], 20.0, lims)
        assert m is not None and not m.exact
        end = m.sample(m.length)
        assert abs(end[1] - 30.0) < 1e-6      # Δz matched
        assert abs(end[2] - 0.0) < 1e-9       # γ matched
        assert abs(m.theta - lims[1]) < 1e-12  # slope pinned to the boundary
        lo, hi = m.pitch_range()
        assert lims[0] - 1e-9 <= lo and hi <= lims[1] + 1e-9
        # no vertical loops: both arc sweeps stay below pi (the reference's
        # >pi special cases exist to guarantee exactly this)
        assert abs(m.sweeps[0]) < np.pi and abs(m.sweeps[1]) < np.pi

    def test_lower_bound_positive_on_steep_scenarios(self):
        """lower_bound no longer collapses to 0.0 when the exact vertical
        profile violates pitch: the clamped construction supplies a
        positive, still-optimistic estimate (reference getLowerBound uses
        Vertical for the same reason, reference dubins3d.py:154-188)."""
        from aircraft_tpu.dubins.dubins3d import lower_bound

        lims = (-np.deg2rad(15), np.deg2rad(15))
        qi = np.array([0, 0, 0, 0, 0.0])
        qf = np.array([60.0, 10.0, 55.0, 0.5, 0.0])  # very steep transfer
        lb = lower_bound(qi, qf, 20.0, lims)
        assert lb > 0.0
        # optimistic: any constructible maneuver must be at least this long
        m = maneuver3d(qi, qf, 20.0, pitch_limits=lims, n_radius_search=32)
        if m is not None:
            assert lb <= m.length * 1.01 + 1e-6
        # and at least the pitch-limited climb length
        assert lb >= 55.0 / np.sin(lims[1]) * 0.9
