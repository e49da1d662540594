"""Batched MPC serving: thousands of simultaneous receding-horizon
controllers on one device (or a mesh).

The production shape of the framework (BASELINE configs 3 & 5): a fleet of
gliders, each with its own perturbed initial state, replanning in lockstep.
One compiled program serves the whole fleet; on a multi-chip mesh the batch
shards over the data-parallel axis with zero code changes.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/batched_mpc.py --batch 64
  python examples/batched_mpc.py --batch 1024          # real TPU
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import SolverConfig, glider_config
from aircraft_tpu.control.initialisation import DubinsInitialiser
from aircraft_tpu.control.mhtt import MHTT
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.observability import solver_metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--mesh", action="store_true",
                    help="shard the batch over all available devices")
    args = ap.parse_args()

    cfg = glider_config()
    params = AircraftParams.from_config(cfg.aircraft)
    track = DubinsInitialiser(cfg)
    mhtt = MHTT(
        params, cfg, track, num_nodes=25, dt=0.02, overlap=15, substeps=2,
        solver_config=SolverConfig(max_al_iters=2, max_inner_iters=10,
                                   hessian="gauss_newton"),
    )

    x0 = jnp.asarray(cfg.waypoints.initial_state, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x0s = jnp.tile(x0[None], (args.batch, 1)) + 0.5 * jax.random.normal(
        key, (args.batch, 13)
    ) * jnp.asarray([1, 1, 1, 1, 1, 1, 0.01, 0.01, 0.01, 0.01, 0.02, 0.02, 0.02])

    if args.mesh and len(jax.devices()) > 1:
        from aircraft_tpu.parallel import make_mesh, shard_batch

        mesh = make_mesh()
        x0s = shard_batch(x0s, mesh)
        print(f"sharding batch {args.batch} over mesh {mesh.shape}")

    t0 = time.time()
    out = mhtt.run_batch(x0s, max_windows=args.windows, progress_target=0.95)
    wall = time.time() - t0
    total_solves = args.batch * out["windows"]
    print(f"fleet of {args.batch}: {out['windows']} replan rounds, "
          f"{total_solves} window solves in {wall:.1f}s "
          f"({total_solves / wall:.0f} solves/s incl. compile)")
    print(f"median progress {np.median(out['progress']):.3f}, "
          f"success rate {out['success_rate']:.2f}")


if __name__ == "__main__":
    main()
