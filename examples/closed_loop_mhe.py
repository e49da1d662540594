"""Closed-loop MPC + moving-horizon estimation under wind disturbance.

BASELINE config 4: the receding-horizon tracking controller flies the
Dubins course while a constant unknown wind pushes the TRUE plant; a
moving-horizon estimator fits the wind from the recent measurement window
and the controller's internal model is corrected with the estimate each
replan.  All three pieces (plant, estimator, controller) share the same
dynamics kernels.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/closed_loop_mhe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import SolverConfig, TrajectoryConfig, glider_config
from aircraft_tpu.control.initialisation import DubinsInitialiser
from aircraft_tpu.control.mhe import estimate_wind
# (controller built directly from build_mhtt_ocp below)
from aircraft_tpu.dynamics import aircraft as ac
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.solvers import integrators


def course() -> TrajectoryConfig:
    base = glider_config()
    return TrajectoryConfig.from_dict(
        {
            "waypoints": {
                "waypoints": [[120.0, 10.0, -195.0], [240.0, -10.0, -190.0]],
                "initial_state": [0, 0, -200, 50, 0, 0, 0, 0, 0, 1, 0, 0, 0],
                "default_velocity": 45,
                "waypoint_indices": [0, 1, 2],
                "waypoint_tolerance": 10.0,
            },
            "aircraft": base.aircraft.__dict__,
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
    cfg = course()
    params = AircraftParams.from_config(cfg.aircraft)
    true_wind = jnp.array([4.0, -3.0, 0.0])   # unknown to the controller
    dt, substeps = 0.02, 2
    N, overlap = 25, 15

    # TRUE plant: flies in the wind
    true_deriv = lambda x, u: ac.state_derivative(params, x, u, wind=true_wind)
    true_step = jax.jit(
        integrators.make_step_fn(params, substeps=substeps, normalize="step",
                                 derivative_fn=true_deriv)
    )

    track = DubinsInitialiser(cfg)
    # wind-aware controller: the MHE estimate rides constant state channels
    # z = [x(13), s, wind(3)], so each replan adapts with NO retrace
    from aircraft_tpu.control.mhtt import build_mhtt_ocp
    from aircraft_tpu.solvers import ilqr

    ocp = build_mhtt_ocp(params, cfg, track.track_points, track.length(),
                         dt=dt, substeps=substeps, wind_channels=True)
    scfg = SolverConfig(max_al_iters=2, max_inner_iters=10, hessian="gauss_newton")
    solve = jax.jit(lambda z0, us: ilqr.solve(ocp, z0, us, scfg))
    commit_n = N - overlap

    x = jnp.asarray(cfg.waypoints.initial_state, dtype=jnp.float32)
    s = 0.0
    us_warm = jnp.zeros((N, 7), dtype=jnp.float32)
    wind_est = jnp.zeros(3)
    meas_x, meas_u = [np.asarray(x)], []

    for window in range(8):
        z0 = jnp.concatenate([x, jnp.asarray([s], jnp.float32), wind_est.astype(jnp.float32)])
        sol = solve(z0, us_warm)
        commit = commit_n
        # fly the committed controls on the TRUE (windy) plant
        for k in range(commit):
            u = sol.us[k]
            meas_u.append(np.asarray(u))
            x = true_step(x, u, dt)
            meas_x.append(np.asarray(x))
        s = float(sol.xs[commit, 13])
        us_warm = jnp.concatenate(
            [sol.us[commit:], jnp.tile(sol.us[-1:], (commit, 1))], axis=0
        )

        # MHE: estimate the wind from the last window of measurements
        W = min(len(meas_u), 20)
        xs_win = jnp.asarray(np.stack(meas_x[-(W + 1):]))
        us_win = jnp.asarray(np.stack(meas_u[-W:]))
        est = estimate_wind(params, xs_win, us_win, jnp.asarray(dt), substeps, 8)
        wind_est = est.wind
        err = float(jnp.linalg.norm(wind_est - true_wind))
        print(f"window {window}: progress={s:.3f} "
              f"wind_est={np.asarray(wind_est).round(2)} "
              f"(true {np.asarray(true_wind).round(2)}, err {err:.2f} m/s) "
              f"mhe_residual={float(est.residual):.3f}", flush=True)

    assert err < 1.0, f"wind estimate off by {err} m/s"
    print("closed-loop MPC+MHE complete: wind identified within 1 m/s")


if __name__ == "__main__":
    main()
