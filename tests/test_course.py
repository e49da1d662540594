"""Closed-loop full-course machinery (control/course.py).

The complete 4-waypoint there-and-back course takes ~5 min on CPU
(examples/full_course.py flies it; all four waypoints pass within the
10 m xy tolerance).  Here the same machinery is exercised on the opening
of the course — enough windows to reach and score the first waypoint —
plus unit checks of the geometry helpers.
"""

import numpy as np
import pytest

from aircraft_tpu.config import TrajectoryConfig

GLIDER_PROBLEM = {
    "waypoints": {
        "waypoints": [[150.0, 10.0, -190.0], [0.0, 20.0, -180.0],
                      [150.0, 10.0, -190.0], [0.0, 0.0, -180.0]],
        "initial_state": [0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0],
        "default_velocity": 30,
        "waypoint_indices": [0, 1],
        "waypoint_tolerance": 10.0,
    },
    "aircraft": {
        "mass": 4.0, "span": 2.0, "length": 1.2, "chord": 0.124605,
        "reference_area": 0.238, "aero_centre_offset": [0.133, 0, 0.003],
        "Ixx": 0.155, "Iyy": 0.114, "Izz": 0.262, "Ixz": 0.01,
        "glide_ratio": 3.0, "r_min": 1.0,
    },
    "state": {"alpha": [-15, 15], "beta": [-15, 15], "airspeed": [30, 100]},
    "control": {
        "aileron_limit": [-10, 10], "elevator_limit": [-10, 10],
        "rudder_limit": [-10, 10],
        "throttle_limit": [[0, 0, 0], [0, 0, 0]],
        "centre_of_mass_limit": [[-0.5, -0.1, -0.1], [0.5, 0.1, 0.1]],
    },
}


class TestCourseGeometry:
    def test_glide_track_passes_through_waypoints_xy(self):
        from aircraft_tpu.control.initialisation import DubinsInitialiser

        cfg = TrajectoryConfig.from_dict(GLIDER_PROBLEM)
        tr = DubinsInitialiser(
            cfg, r_min=125.0, n_track_points=512, z_mode="glide",
            glide_ld=13.0, r_min_per_segment=[163.0, 163.0, 69.0, 69.0],
            extend=150.0,
        )
        pts = np.asarray(tr.track_points)
        for w in np.asarray(cfg.waypoints.array()):
            d = np.linalg.norm(pts[:, :2] - w[:2], axis=1)
            assert d.min() < 4.0, w
        # glide z-profile: monotone descent at the requested slope
        dz = np.diff(pts[:, 2])
        assert np.all(dz > 0)  # NED: descending
        slope = (pts[-1, 2] - pts[0, 2]) / tr.total_length
        np.testing.assert_allclose(slope, 1.0 / 13.0, rtol=0.05)
        # run-out extension recorded as a segment
        assert abs(tr.segment_lengths[-1] - 150.0) < 1e-6

    def test_waypoint_misses_enforces_order(self):
        from aircraft_tpu.control.course import waypoint_misses

        cfg = TrajectoryConfig.from_dict(GLIDER_PROBLEM)
        # synthetic path: out to wp0, back to wp1, out to wp2, back to wp3
        legs = [
            np.linspace([0, 0], [150, 10], 40),
            np.linspace([150, 10], [0, 20], 40),
            np.linspace([0, 20], [150, 10], 40),
            np.linspace([150, 10], [0, 0], 40),
        ]
        xy = np.concatenate(legs)
        states = np.zeros((xy.shape[0], 13), np.float32)
        states[:, :2] = xy
        misses = waypoint_misses(states, cfg)
        assert len(misses) == 4
        assert all(m < 1.0 for m in misses)

    def test_reversal_headings_are_incoming(self):
        """There-and-back waypoints keep the through-flight heading so the
        approach leg is straight (the turnaround lives in the NEXT
        segment)."""
        from aircraft_tpu.control.initialisation import DubinsInitialiser

        cfg = TrajectoryConfig.from_dict(GLIDER_PROBLEM)
        tr = DubinsInitialiser(cfg, r_min=125.0, z_mode="glide")
        # first segment start -> wp0 is a straight line (no turnaround
        # before the waypoint)
        assert tr.segment_lengths[0] < 1.05 * np.hypot(150.0, 10.0)


class TestCourseOpening:
    @pytest.mark.slow
    def test_first_waypoint_passes_closed_loop(self):
        """Fly the opening of the reference course (first waypoint) with
        the full driver; examples/full_course.py covers all four."""
        from aircraft_tpu.control.course import solve_full_course

        cfg = TrajectoryConfig.from_dict(GLIDER_PROBLEM)
        out = solve_full_course(cfg, max_windows=45)
        assert np.isfinite(out["states"]).all()
        assert out["misses"][0] < cfg.waypoints.tolerance, out["misses"]
        # healthy flight: no stall departure, no ground contact
        assert out["speed_range"][0] > 15.0
        assert np.all(out["states"][:, 2] < -5.0)

    def test_first_waypoint_passes_with_gated_dual_carry(self):
        """The course opening IS the energy-bleed transient (50 -> 22 m/s,
        early windows genuinely infeasible) that poisoned the verbatim dual
        carry (round-3: frozen at s=0.18 / wp2 missed by 155 m).  With the
        violation-gated carry (MHTT.carry_gate: infeasible windows hand
        cold duals forward) the carried duals must be >= neutral here —
        same first-waypoint pass, no stall, no ground contact."""
        from aircraft_tpu.control.course import solve_full_course

        cfg = TrajectoryConfig.from_dict(GLIDER_PROBLEM)
        out = solve_full_course(cfg, max_windows=45, dual_carry=True)
        assert np.isfinite(out["states"]).all()
        assert out["misses"][0] < cfg.waypoints.tolerance, out["misses"]
        assert out["speed_range"][0] > 15.0
        assert np.all(out["states"][:, 2] < -5.0)
