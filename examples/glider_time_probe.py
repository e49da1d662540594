"""Static-dt probe ladder on the glider short course — the committed
evidence behind the free-time rows honestly returning the fixed-time
incumbent.

The free-time ablation rows return the fixed-time answer on the glider.
The claim that this is an ENERGY limit of the plant — not a solver gap —
rested on sub-nominal probes quoted only in a test docstring (round-4
verdict #5).  This script IS that measurement, committed: run the
time-optimal sweep machinery (`waypoints.solve_time_optimal` — every
candidate warm-started from the SOLVED nominal racing solution with μ
passage impulses re-placed, defect-gated so an unconverged candidate
cannot fake feasibility) over a ladder of uniformly contracted schedules
and record, per scale, the waypoint miss and the rollout-defect gate.

Two distinct failure signatures appear and the artifact separates them:
  * miss > tolerance with a CLEAN rollout — the flown-faster schedule
    genuinely cannot thread the waypoints (the energy argument: a glider
    has no thrust; flying the same geometry in 85% of the time demands
    kinetic energy the plant cannot generate — reference
    control/variable_time.py:29 bought time on powered plants only);
  * defect-gated — the candidate solve never accepted a true rollout and
    handed back its (dynamics-inconsistent) seed; counted as infeasible,
    never as evidence.

The controllable-plant counterpart (free time measurably buying 50% of a
quadrotor schedule through the SAME machinery) is
data/runs/quad_time_optimal.json.

Writes data/runs/glider_time_probe.json; asserted by
tests/test_control.py (TestTimeOptimalSweep).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/glider_time_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from aircraft_tpu.config import SolverConfig, TrajectoryConfig, glider_config


def short_course_config() -> TrajectoryConfig:
    """The two-waypoint short course the controller tests solve
    (tests/test_control.py short_course_config — duplicated here so the
    committed artifact states its course explicitly)."""
    base = glider_config()
    d = {
        "waypoints": {
            "waypoints": [[120.0, 10.0, -195.0], [240.0, -10.0, -190.0]],
            "initial_state": [0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0],
            "default_velocity": 45,
            "waypoint_indices": [0, 1, 2],
            "waypoint_tolerance": 10.0,
        },
        "aircraft": dict(
            mass=4.0, span=2.0, length=1.2, chord=0.124605,
            reference_area=0.238, aero_centre_offset=[0.133, 0, 0.003],
            Ixx=0.155, Iyy=0.114, Izz=0.262, Ixz=0.01,
            glide_ratio=3.0, r_min=1.0,
        ),
        "state": {"alpha": [-15, 15], "beta": [-15, 15],
                  "airspeed": [30, 100]},
        "control": {
            "aileron_limit": [-10, 10],
            "elevator_limit": [-10, 10],
            "rudder_limit": [-10, 10],
            "throttle_limit": [[0, 0, 0], [0, 0, 0]],
            "centre_of_mass_limit": [[-0.5, -0.1, -0.1], [0.5, 0.1, 0.1]],
        },
    }
    return TrajectoryConfig.from_dict(d)


def run_probe_ladder(num_nodes: int = 70, dt: float = 0.1,
                     substeps: int = 10, n_candidates: int = 8) -> dict:
    from aircraft_tpu.control import waypoints as wp
    from aircraft_tpu.dynamics.aircraft import AircraftParams

    course = short_course_config()
    params = AircraftParams.from_config(course.aircraft)
    solver_config = SolverConfig(max_al_iters=6, max_inner_iters=20)
    tol = float(course.waypoints.tolerance)

    t0 = time.time()
    res = wp.solve_time_optimal(
        params, course, num_nodes=num_nodes, dt_nominal=dt,
        substeps=substeps, n_candidates=n_candidates, dt_span=(0.6, 0.95),
        solver_config=solver_config,
    )
    wall = time.time() - t0

    rows = []
    for i in range(len(res["candidate_dts"])):
        dt_i = float(res["candidate_dts"][i])
        miss = float(np.max(res["dmins"][i]))
        defect = float(res["defects"][i])
        feas = bool(res["feasible"][i])
        rows.append({
            "scale": round(dt_i / dt, 4),
            "dt": round(dt_i, 5),
            "total_time_s": round(dt_i * num_nodes, 3),
            "max_waypoint_miss_m": round(miss, 2),
            "rollout_defect": (round(defect, 6) if np.isfinite(defect)
                               else "nan"),
            "feasible": feas,
            "failure_mode": (None if feas else
                             ("miss" if (miss > tol and defect < 1e-2)
                              else "defect_gate")),
        })
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    feasible_scales = [r["scale"] for r in rows if r["feasible"]]
    sub = [r for r in rows if r["scale"] < 0.999]
    return {
        "metric": "glider_static_dt_probe_min_feasible_scale",
        "value": (min(feasible_scales) if feasible_scales else None),
        "unit": "fraction_of_nominal_schedule",
        "course": "short two-waypoint course (tests short_course_config)",
        "num_nodes": num_nodes,
        "dt_nominal": dt,
        "substeps": substeps,
        "tolerance_m": tol,
        "selected_total_time_s": round(float(res["total_time"]), 3),
        "nominal_total_time_s": round(num_nodes * dt, 3),
        "n_subnominal_feasible": sum(r["feasible"] for r in sub),
        "sweep_wall_s": round(wall, 1),
        "solver": {"al": solver_config.max_al_iters,
                   "inner": solver_config.max_inner_iters},
        "ladder": rows,
        "device": str(jax.devices()[0]),
    }


def main():
    out = run_probe_ladder()
    runs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "runs")
    os.makedirs(runs, exist_ok=True)
    path = os.path.join(runs, "glider_time_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "ladder"}))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
