"""Free-time point-to-point: measured time bought by the time axis.

The reference's variable-time runs (reference control/variable_time.py:29,
todo.md block 3: 5470 s of IPOPT for one time-optimized trajectory) exist
to answer one question — how much faster than the nominal schedule can the
plant fly the task?  This demo answers it on the framework's controllable
plant: a quadrotor goal reachable in ~3 s is solved at a deliberately
slack 6 s nominal, the static-dt ladder finds the fastest feasible uniform
schedule, and the per-knot 'variable' formulation refines/confirms it.
Writes data/runs/quad_time_optimal.json (round-3 verdict #4: committed
artifact where free-time's objective differs from fixed-time's).

Run CPU-only (~3 min):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/time_optimal_quad.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from aircraft_tpu.control.quadrotor import solve_quadrotor_time_optimal

    target = [30.0, 20.0, -15.0]
    t0 = time.time()
    out = solve_quadrotor_time_optimal(target)
    wall = time.time() - t0

    print(f"target {target}, nominal schedule T = {out['T_nominal']:.2f} s")
    for r in out["candidates"]:
        print(f"  dt={r['dt']:.3f}  T={r['T']:.2f}s  miss={r['miss']:.4f} m "
              f"defect={r['defect']:.1e}  "
              f"{'FEASIBLE' if r['feasible'] else 'infeasible'}")
    print(f"fastest feasible uniform schedule: T = {out['T_uniform']:.2f} s")
    if out.get("T_variable_from_nominal") is not None:
        print(f"per-knot 'variable' from the slack nominal: "
              f"T = {out['T_variable_from_nominal']:.2f} s "
              f"(miss {out['miss_variable_from_nominal']:.3f} m)")
    saved = out["T_nominal"] - out["T_final"]
    print(f"TIME BOUGHT: {saved:.2f} s ({saved / out['T_nominal']:.0%} of "
          f"the nominal schedule) in {wall:.0f} s wall")

    runs = os.path.join(_REPO_ROOT, "data", "runs")
    os.makedirs(runs, exist_ok=True)
    report = {
        "experiment": "quad_time_optimal",
        "device": str(jax.devices()[0]),
        "target": target,
        "T_nominal_s": out["T_nominal"],
        "T_uniform_s": out["T_uniform"],
        "T_variable_from_nominal_s": out.get("T_variable_from_nominal"),
        "T_final_s": out["T_final"],
        "time_saved_s": round(saved, 3),
        "miss_final_m": out["miss_uniform"],
        "candidates": out["candidates"],
        "wall_s": round(wall, 1),
    }
    path = os.path.join(runs, "quad_time_optimal.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"saved {path}")
    return 0 if saved > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
