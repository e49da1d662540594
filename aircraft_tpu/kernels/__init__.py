from aircraft_tpu.kernels.rollout_kernel import (
    make_fused_rollout,
    make_fused_rollout_tiles,
)
from aircraft_tpu.kernels.cholesky_kernel import make_batched_cholesky_solve
from aircraft_tpu.kernels.window_kernel import (
    make_backward_kernel,
    make_forward_kernel,
    make_window_spec,
)

__all__ = [
    "make_fused_rollout",
    "make_fused_rollout_tiles",
    "make_batched_cholesky_solve",
    "make_backward_kernel",
    "make_forward_kernel",
    "make_window_spec",
]
