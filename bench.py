"""Benchmark: batched 6-DoF NN-surrogate MPC solves/s at horizon N=50.

The BASELINE.json headline metric: full-horizon MPC solves per second per
chip at N=50, vs the reference real-time replanning budget of 0.2 s per
committed window (reference main/mhe/mhtt.py:62,77 — horizon 50 at
dt=0.01 with overlap 30).  The reference solves one window at a time on
CPU inside that budget; here a whole scenario batch solves in one XLA
program, so throughput = batch / wall.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

# persistent compile cache: the heavyweight first compile is paid once per
# program shape across bench invocations
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aircraft_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aircraft_tpu.config import SolverConfig, glider_config
from aircraft_tpu.control.initialisation import DubinsInitialiser
from aircraft_tpu.control.mhtt import build_mhtt_ocp
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.dynamics.coefficients import MLPCoeffParams
from aircraft_tpu.solvers import ilqr

# reference budget: one N=50 window per 0.2 s of committed trajectory
BASELINE_SOLVES_PER_S = 5.0

N_HORIZON = 50
DT = 0.01
BATCH = int(os.environ.get("BENCH_BATCH", "256"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = glider_config()
    mlp_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data", "networks", "mlp.npz")
    if os.path.exists(mlp_path):
        # surrogate trained from the reference wind-tunnel CSV
        # (examples/fit_surrogates.py)
        from aircraft_tpu.surrogates.models import load_mlp

        coeff = load_mlp(mlp_path)
    else:
        coeff = MLPCoeffParams.init(jax.random.PRNGKey(0)).replace(
            input_mean=jnp.asarray([1500.0, 0.0, 0.0, 0.0, 0.0]),
            input_std=jnp.asarray([1000.0, 0.15, 0.15, 3.0, 3.0]),
            output_mean=jnp.asarray([-0.05, 0.0, -0.4, 0.0, 0.0, 0.0]),
            output_std=jnp.asarray([0.05, 0.05, 0.3, 0.03, 0.1, 0.01]),
        )
    params = AircraftParams.from_config(cfg.aircraft, coeff=coeff)

    track = DubinsInitialiser(cfg)
    ocp = build_mhtt_ocp(params, cfg, track.track_points, track.length(), dt=DT)

    solver_cfg = SolverConfig(max_al_iters=2, max_inner_iters=8, hessian="gauss_newton")

    x0 = jnp.concatenate(
        [jnp.asarray(cfg.waypoints.initial_state, dtype=jnp.float32),
         jnp.zeros(1, dtype=jnp.float32)]
    )
    key = jax.random.PRNGKey(42)
    noise = 0.01 * jax.random.normal(key, (BATCH, 14))
    noise = noise.at[:, 13].set(0.0)
    x0s = jnp.tile(x0[None], (BATCH, 1)) + noise
    us0 = jnp.zeros((BATCH, N_HORIZON, 7), dtype=jnp.float32)

    solve = jax.jit(
        lambda x0s, us: ilqr.solve_batch(ocp, x0s, us, solver_cfg)
    )

    # compile + first execution
    t0 = time.time()
    sols = solve(x0s, us0)
    sols.xs.block_until_ready()
    compile_wall = time.time() - t0

    # timed warm executions
    walls = []
    for _ in range(REPS):
        t0 = time.time()
        sols = solve(x0s, us0)
        sols.xs.block_until_ready()
        walls.append(time.time() - t0)
    wall = float(np.median(walls))

    solves_per_s = BATCH / wall
    n_finite = int(np.isfinite(np.asarray(sols.cost)).sum())

    print(
        json.dumps(
            {
                "metric": "6dof_nn_mpc_solves_per_s_N50_per_chip",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
                "batch": BATCH,
                "wall_s_per_batch": round(wall, 4),
                "latency_s_per_window": round(wall, 4),
                "compile_s": round(compile_wall, 1),
                "finite_fraction": round(n_finite / BATCH, 3),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
