"""Fitted-artifact loading and free-time waypoint modes."""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aircraft_tpu.config import SolverConfig, glider_config
from aircraft_tpu.dynamics.aircraft import AircraftParams

REPO = Path(__file__).resolve().parent.parent
CFG = glider_config()


class TestFittedArtifacts:
    def test_poly_npz_loads_and_flies(self):
        p = REPO / "data" / "networks" / "poly.npz"
        if not p.exists():
            pytest.skip("poly artifact not generated")
        from aircraft_tpu.dynamics.coefficients import load_coefficient_model
        from aircraft_tpu.solvers import integrators
        from aircraft_tpu.solvers.rollout import rollout

        coeff = load_coefficient_model("poly", p)
        params = AircraftParams.from_config(CFG.aircraft, coeff=coeff)
        step = integrators.make_step_fn(params, substeps=5, normalize="step")
        x0 = jnp.asarray(CFG.waypoints.initial_state, dtype=jnp.float32)
        xs = np.asarray(rollout(step, x0, jnp.zeros((50, 7)), 0.02))
        # the fitted model is strongly out of pitch trim with zero elevator
        # (q̇ ≈ 35 rad/s² at the nominal point) and a cubic extrapolates
        # badly once the resulting divergence leaves the data envelope —
        # require only a finite initial window before the uncontrolled
        # departure (closed-loop use always trims/regulates first)
        assert np.all(np.isfinite(xs[:5])), xs[:5]
        # and the instantaneous aero at the trim point is in data range
        from aircraft_tpu.dynamics import aircraft as ac

        c = np.asarray(ac.coefficients(params, x0, jnp.zeros(7)))
        assert np.all(np.abs(c) < 3.0), c

    def test_linear_csv_loads(self):
        p = REPO / "data" / "networks" / "linearised.csv"
        if not p.exists():
            pytest.skip("linear artifact not generated")
        from aircraft_tpu.dynamics.coefficients import load_coefficient_model

        coeff = load_coefficient_model("linear", p)
        assert coeff.matrix.shape == (6, 6)

    def test_reference_linearised_csv_loads(self):
        ref = Path("/root/reference/data/networks/linearised.csv")
        if not ref.exists():
            pytest.skip("reference csv not present")
        from aircraft_tpu.dynamics.coefficients import LinearCoeffParams

        coeff = LinearCoeffParams.from_csv(ref)
        assert coeff.matrix.shape == (6, 6)


class TestFreeTimeModes:
    def test_progress_mode_solves_within_bounds(self):
        """Free-time ('progress') racing: the solve must stay finite, keep
        every per-knot dt inside its declared box, and not regress the
        warm start's waypoint passage.

        KNOWN LIMIT (round 1): on this course the free-time refinement does
        not yet shorten the schedule below the warm start — candidate
        rollouts with joint time-warp + control moves are rejected by the
        line search (see control/waypoints.py feedback-mask note).
        """
        import sys

        sys.path.insert(0, str(REPO / "tests"))
        from test_control import short_course_config

        from aircraft_tpu.control import waypoints as wp

        cfg = short_course_config()
        params = AircraftParams.from_config(cfg.aircraft)
        N = 70
        sol = wp.solve_waypoint_racing(
            params, cfg, num_nodes=N, dt=0.1, substeps=10, time_mode="progress",
            solver_config=SolverConfig(max_al_iters=5, max_inner_iters=15),
        )
        xs = np.asarray(sol.xs)
        vs = np.asarray(sol.us)
        assert np.all(np.isfinite(xs))
        # per-knot dt from the ν channel stays inside the auto box
        nu = vs[:, -1]
        dts = 1.0 / (nu**2 + 1e-9)
        assert np.all(dts > 0.1 / 10 - 1e-6) and np.all(dts < 0.1 * 4 + 1e-4), (
            dts.min(), dts.max(),
        )
        # first waypoint still passed within tolerance
        w0 = cfg.waypoints.array()[0]
        assert np.linalg.norm(xs[:, :3] - w0, axis=1).min() < cfg.waypoints.tolerance

    def test_variable_mode_builds_and_steps(self):
        from aircraft_tpu.control import waypoints as wp

        params = AircraftParams.from_config(CFG.aircraft)
        ocp = wp.build_waypoint_ocp(
            params, CFG, dt=0.05, num_nodes=10, time_mode="variable"
        )
        z0, vs = wp.initial_guess(CFG, 10, time_mode="variable", dt=0.05)
        z1 = ocp.step(z0, vs[0], 0)
        assert np.all(np.isfinite(np.asarray(z1)))

    def test_adaptive_mode_error_constraint_active(self):
        from aircraft_tpu.control import waypoints as wp

        params = AircraftParams.from_config(CFG.aircraft)
        ocp = wp.build_waypoint_ocp(
            params, CFG, dt=0.05, num_nodes=10, time_mode="adaptive",
            adaptive_tol=1e-8,  # tight tolerance -> constraint must violate
        )
        z0, vs = wp.initial_guess(CFG, 10, time_mode="adaptive", dt=0.05)
        g = np.asarray(ocp.ineq(z0, vs[0], 0))
        assert g[-1] > 0.0  # error surrogate exceeds the tight tol


class TestReferenceConfigParity:
    def test_reference_json_loads_with_expected_fields(self):
        """Schema lock: the reference problem file must keep loading with
        the documented values (reference data/glider/problem_definition.json)."""
        import pathlib

        ref = pathlib.Path("/root/reference/data/glider/problem_definition.json")
        if not ref.exists():
            pytest.skip("reference problem file not present")
        from aircraft_tpu.config import TrajectoryConfig

        cfg = TrajectoryConfig.from_json(ref)
        assert cfg.aircraft.mass == 4.0
        assert cfg.aircraft.span == 2.0
        assert cfg.aircraft.reference_area == 0.238
        assert cfg.aircraft.Ixz == 0.01
        np.testing.assert_allclose(
            cfg.waypoints.initial_state,
            [0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0],
        )
        assert cfg.waypoints.default_velocity == 30
        assert cfg.waypoints.tolerance == 10.0
        assert len(cfg.waypoints.waypoints) == 4
        # 2-index objective triggers the glide-slope altitude backfill
        assert cfg.waypoints.waypoint_indices == (0, 1)
        wps = cfg.waypoints.array()
        assert np.all(np.diff(wps[:, 2]) > 0)  # z monotonically down-slope
        lb, ub = cfg.control.bounds(7)
        np.testing.assert_allclose(lb[:3], [-10, -10, -10])
        np.testing.assert_allclose(ub[:3], [10, 10, 10])

    def test_shipped_problem_json_matches_reference(self):
        """The in-repo data/glider/problem_definition.json (written by
        config.write_glider_problem_json from GLIDER_PROBLEM) must load to
        the same config as the reference's file AND as glider_config()."""
        import pathlib

        from aircraft_tpu.config import TrajectoryConfig, glider_config

        repo = pathlib.Path(__file__).resolve().parents[1]
        ours = TrajectoryConfig.from_json(
            repo / "data/glider/problem_definition.json"
        )
        assert ours == glider_config()
        ref = pathlib.Path("/root/reference/data/glider/problem_definition.json")
        if ref.exists():
            assert ours == TrajectoryConfig.from_json(ref)

    def test_config_to_dict_round_trip_3d(self):
        """to_dict/save_json round-trip for 3D waypoint objectives (2D
        objectives re-apply the glide backfill on load — documented)."""
        from aircraft_tpu.config import GLIDER_PROBLEM, TrajectoryConfig

        d = {**GLIDER_PROBLEM,
             "waypoints": {**GLIDER_PROBLEM["waypoints"],
                           "waypoint_indices": [0, 1, 2]}}
        cfg = TrajectoryConfig.from_dict(d)
        assert TrajectoryConfig.from_dict(cfg.to_dict()) == cfg
