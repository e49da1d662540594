"""Open-loop simulation with a bang-bang roll script + dashboard.

Parity with the reference open-loop entry point (reference
main/dynamics/dynamics.py:59-149: simulate, print the elevator Jacobian,
save H5, plot) — except the hot loop is one `lax.scan`, not one CasADi VM
call per step.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/openloop_sim.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import glider_config
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.plotting import TrajectoryPlotter
from aircraft_tpu.solvers import integrators
from aircraft_tpu.solvers.trim import multistart_trim
from aircraft_tpu.utils import TrajectoryData


def main():
    cfg = glider_config()
    params = AircraftParams.from_config(cfg.aircraft)
    dt, T = 0.01, 500

    trim = multistart_trim(params, jax.random.PRNGKey(0), n_starts=64,
                           target_airspeed=50.0)
    print(f"trim residual {float(trim.residual):.2e}")
    u_trim = trim.control[:7]

    # bang-bang roll script on top of trim (reference dynamics.py:59-105)
    us = jnp.tile(u_trim[None], (T, 1))
    us = us.at[100:150, 0].add(2.0).at[150:200, 0].add(-2.0)

    step = integrators.make_step_fn(params, substeps=5, normalize="step")
    x0 = jnp.asarray(cfg.waypoints.initial_state, dtype=jnp.float32)

    from aircraft_tpu.solvers.rollout import rollout

    xs = rollout(jax.jit(step), x0, us, dt)
    xs_np = np.asarray(xs)
    nan_at = np.where(~np.isfinite(xs_np).all(axis=1))[0]
    print(f"simulated {T} steps; first NaN: {nan_at[0] if len(nan_at) else 'none'}")

    # elevator sensitivity (reference prints the elevator Jacobian column)
    B = jax.jacfwd(lambda u: step(x0, u, dt))(u_trim)
    print("elevator column of step Jacobian (pos/vel rows):",
          np.asarray(B[:6, 1]).round(5))

    out = "data/visualisation"
    os.makedirs(out, exist_ok=True)
    data = TrajectoryData(state=xs_np, control=np.asarray(us), time=np.arange(T + 1) * dt)
    data.save_h5(f"{out}/openloop.h5")
    TrajectoryPlotter(dt=dt).save(data, f"{out}/openloop.png")
    print(f"saved {out}/openloop.{{h5,png}}")


if __name__ == "__main__":
    main()
