from aircraft_tpu.solvers.integrators import make_step_fn, rk4_step, step
from aircraft_tpu.solvers.rollout import (
    batch_rollout,
    closed_loop_rollout,
    linearize_along,
)

# NOTE: the `rollout` *function* is deliberately not re-exported here —
# it would shadow the `aircraft_tpu.solvers.rollout` submodule binding.
# Use `from aircraft_tpu.solvers.rollout import rollout`.

__all__ = [
    "make_step_fn",
    "rk4_step",
    "step",
    "closed_loop_rollout",
    "linearize_along",
    "batch_rollout",
]
