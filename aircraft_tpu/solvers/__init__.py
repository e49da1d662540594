from aircraft_tpu.solvers.integrators import make_step_fn, rk4_step, step
from aircraft_tpu.solvers.rollout import (
    batch_rollout,
    closed_loop_rollout,
    linearize_along,
    rollout,
)

__all__ = [
    "make_step_fn",
    "rk4_step",
    "step",
    "rollout",
    "closed_loop_rollout",
    "linearize_along",
    "batch_rollout",
]
