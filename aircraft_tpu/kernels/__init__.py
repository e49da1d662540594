from aircraft_tpu.kernels.rollout_kernel import (
    make_fused_rollout,
    make_fused_rollout_tiles,
)
from aircraft_tpu.kernels.cholesky_kernel import make_batched_cholesky_solve

__all__ = [
    "make_fused_rollout",
    "make_fused_rollout_tiles",
    "make_batched_cholesky_solve",
]
