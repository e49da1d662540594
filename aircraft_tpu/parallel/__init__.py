from aircraft_tpu.parallel.mesh import (
    BATCH_AXIS,
    TENSOR_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from aircraft_tpu.parallel.batched import BatchSummary, solve_batch_sharded

__all__ = [
    "BATCH_AXIS",
    "TENSOR_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "BatchSummary",
    "solve_batch_sharded",
]
