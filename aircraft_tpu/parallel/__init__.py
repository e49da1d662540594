from aircraft_tpu.parallel.mesh import (
    BATCH_AXIS,
    TENSOR_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from aircraft_tpu.parallel.batched import BatchSummary, solve_batch_sharded
from aircraft_tpu.parallel.seq_riccati import (
    SEQ_AXIS,
    backward_associative_sharded,
    make_seq_mesh,
)

__all__ = [
    "BATCH_AXIS",
    "TENSOR_AXIS",
    "SEQ_AXIS",
    "make_mesh",
    "make_seq_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "BatchSummary",
    "solve_batch_sharded",
    "backward_associative_sharded",
]
