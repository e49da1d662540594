"""End-to-end demo: trim → Dubins init → waypoint racing → plots.

The role of the reference's flagship script (reference
main/control/control.py): load the glider problem, trim the plant, build a
geometric warm start, solve the waypoint-traversal OCP, dump the trajectory
and a dashboard figure.

Run CPU-only:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/waypoint_racing.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import SolverConfig, glider_config
from aircraft_tpu.control import waypoints as wp
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.plotting import TrajectoryPlotter
from aircraft_tpu.solvers.trim import multistart_trim, stability_eigenvalues
from aircraft_tpu.utils import TrajectoryData

# a compact two-waypoint course (the full there-and-back problem of
# data/glider/problem_definition.json needs a longer horizon)
from aircraft_tpu.config import TrajectoryConfig

CFG = TrajectoryConfig.from_dict(
    {
        "waypoints": {
            "waypoints": [[120.0, 10.0, -195.0], [240.0, -10.0, -190.0]],
            "initial_state": [0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0],
            "default_velocity": 45,
            "waypoint_indices": [0, 1, 2],
            "waypoint_tolerance": 10.0,
        },
        "aircraft": glider_config().aircraft.__dict__,
        "state": {"alpha": [-15, 15], "beta": [-15, 15], "airspeed": [30, 100]},
        "control": {
            "aileron_limit": [-10, 10],
            "elevator_limit": [-10, 10],
            "rudder_limit": [-10, 10],
            "throttle_limit": [[0, 0, 0], [0, 0, 0]],
            "centre_of_mass_limit": [[-0.5, -0.1, -0.1], [0.5, 0.1, 0.1]],
        },
    }
)


def main():
    params = AircraftParams.from_config(CFG.aircraft)

    t0 = time.time()
    trim = multistart_trim(params, jax.random.PRNGKey(0), n_starts=64, target_airspeed=45.0)
    print(f"trim: residual={float(trim.residual):.2e} "
          f"elevator={float(trim.control[1]):.3f} [{time.time()-t0:.1f}s]")

    eig = stability_eigenvalues(params, trim.state, trim.control)
    print(f"stability: max Re(eig) = {float(np.max(eig.real)):.3f}")

    t0 = time.time()
    sol = wp.solve_waypoint_racing(
        params, CFG, num_nodes=70, dt=0.1, substeps=10,
        solver_config=SolverConfig(max_al_iters=6, max_inner_iters=20),
    )
    xs = np.asarray(sol.xs)
    print(f"waypoint solve: cost={float(sol.cost):.1f} "
          f"viol={float(sol.violation):.2f} [{time.time()-t0:.1f}s]")
    for j, w in enumerate(CFG.waypoints.array()):
        d = np.linalg.norm(xs[:, :3] - w, axis=1)
        print(f"  wp{j}: closest approach {d.min():.1f} m at node {d.argmin()} "
              f"(tolerance {CFG.waypoints.tolerance})")

    out = "data/visualisation"
    os.makedirs(out, exist_ok=True)
    data = TrajectoryData(state=xs[:, :13], control=np.asarray(sol.us)[:, :7],
                          lam=xs[:, 13:])
    data.save_npz(f"{out}/waypoint_racing.npz")
    TrajectoryPlotter(waypoints=CFG.waypoints.array(), dt=0.1).save(
        data, f"{out}/waypoint_racing.png"
    )
    print(f"saved {out}/waypoint_racing.npz and .png")


if __name__ == "__main__":
    main()
