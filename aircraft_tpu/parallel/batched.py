"""Sharded batched solves: thousands of MPC scenarios spread over a mesh.

The solver itself is already `vmap`-batched (solvers/ilqr.py); sharding the
batch axis is a placement decision — GSPMD partitions the whole program
once the inputs carry a NamedSharding, and cross-chip reductions (the
convergence/diagnostic summaries) become ICI collectives automatically.
This is the TPU-native replacement for the reference's serial ablation
loop (reference main/control/ablation.py:212-220).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from aircraft_tpu.config import SolverConfig
from aircraft_tpu.parallel.mesh import batch_sharding, replicated, shard_batch
from aircraft_tpu.solvers import ilqr
from aircraft_tpu.solvers.ocp import OCPFunctions


class BatchSummary(NamedTuple):
    """psum-style reductions over the scenario batch (device-side)."""

    n_converged: jax.Array
    mean_cost: jax.Array
    max_violation: jax.Array
    mean_iterations: jax.Array


from functools import partial


@partial(jax.jit, static_argnums=(0, 3))
def _run_sharded(ocp: OCPFunctions, x0s, us_inits, config: SolverConfig):
    # module-level cached jit (ocp/config static, as ilqr.solve does):
    # a per-call closure would re-trace the whole solve on every
    # invocation, which breaks warm-timing loops (bench scaling mode)
    sols = ilqr.solve_batch(ocp, x0s, us_inits, config)
    summary = BatchSummary(
        n_converged=jnp.sum(sols.converged),
        mean_cost=jnp.mean(sols.cost),
        max_violation=jnp.max(sols.violation),
        mean_iterations=jnp.mean(sols.iterations.astype(jnp.float32)),
    )
    return sols, summary


def solve_batch_sharded(
    ocp: OCPFunctions,
    x0s: jax.Array,
    us_inits: jax.Array,
    mesh: Mesh,
    config: SolverConfig = SolverConfig(),
) -> tuple[ilqr.ILQRSolution, BatchSummary]:
    """Shard the scenario batch over the mesh's dp axis and solve.

    Returns per-scenario solutions (sharded) plus replicated summary
    statistics (XLA inserts the all-reduces)."""
    x0s = shard_batch(x0s, mesh)
    us_inits = shard_batch(us_inits, mesh)
    return _run_sharded(ocp, x0s, us_inits, config)
