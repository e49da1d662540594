"""Device-mesh utilities for scale-out (SURVEY §2.5/§5.8: the reference is
single-process; here the scenario batch is the data-parallel axis sharded
over ICI, and solver-wide diagnostics reduce with psum-style collectives
that XLA inserts from sharding constraints)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "dp"
TENSOR_AXIS = "tp"


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(dp × tp) mesh over the available devices. dp carries the scenario
    batch; tp is available for sharding surrogate-training matmuls."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    assert n % tp == 0, (n, tp)
    arr = np.array(devs).reshape(n // tp, tp)
    return Mesh(arr, (BATCH_AXIS, TENSOR_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for scenario batches."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place every array in `tree` with its leading axis split over dp."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
