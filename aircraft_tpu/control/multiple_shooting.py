"""Multiple shooting as an OCP transform for the AL-iLQR solver.

The reference's transcription is multiple shooting: every knot state is a
decision variable and dynamics enter as defect constraints, which lets
IPOPT start from an infeasible *state* guess (the Dubins initialisation)
(reference control/base.py:275-286, 339-385).  Single-shooting iLQR cannot
accept state guesses — its iterate IS a control sequence.

This transform restores that capability inside the same solver: the horizon
splits into segments; each segment's start state becomes an **augmented
control** at its first knot, the rollout restarts from it, and the matching
defect `x_k − s_k = 0` is an equality handled by the augmented Lagrangian.
Early iterations may "teleport" at segment boundaries (exactly like the
reference's infeasible intermediate iterates); the AL schedule closes the
defects.  Everything remains one fixed-shape XLA program.

    v_k = [u_k (m), s_k (n)]     s_k active only at segment starts
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.solvers.ocp import OCPFunctions


def multiple_shooting_ocp(
    base: OCPFunctions,
    state_dim: int,
    control_dim: int,
    segment_len: int,
    *,
    defect_scale: float = 1.0,
) -> OCPFunctions:
    """Wrap `base` so segment-start states are decision variables."""
    n, m = state_dim, control_dim

    def seg_start(k):
        return (jnp.mod(k, segment_len) == 0) & (k > 0)

    def split(v):
        return v[..., :m], v[..., m : m + n]

    def x_eff(x, v, k):
        u, s = split(v)
        return jnp.where(seg_start(k), s, x)

    def step(x, v, k):
        u, _ = split(v)
        return base.step(x_eff(x, v, k), u, k)

    def stage_cost(x, v, k):
        u, _ = split(v)
        return base.stage_cost(x_eff(x, v, k), u, k)

    def ineq(x, v, k):
        u, _ = split(v)
        return base.ineq(x_eff(x, v, k), u, k)

    def eq(x, v, k):
        u, s = split(v)
        base_eq = base.eq(x_eff(x, v, k), u, k)
        defect = jnp.where(seg_start(k), (x - s) * defect_scale, 0.0)
        return jnp.concatenate([base_eq, defect], axis=-1)

    return OCPFunctions(
        step=step,
        stage_cost=stage_cost,
        terminal_cost=base.terminal_cost,
        ineq=ineq,
        eq=eq,
        terminal_ineq=base.terminal_ineq,
        terminal_eq=base.terminal_eq,
    )


def controls_with_state_guess(
    us: jax.Array,
    state_guess: jax.Array,
    segment_len: int,
) -> jax.Array:
    """Assemble the augmented control warm start: controls + per-knot state
    guess in the s-channels (only segment-start entries matter, but filling
    all knots is harmless and shape-uniform).

    Args: us (N, m), state_guess (N+1, n) — e.g. a Dubins state guess
    (control/initialisation.py). Returns (N, m+n).
    """
    us = jnp.asarray(us)
    sg = jnp.asarray(state_guess)[: us.shape[0]]
    return jnp.concatenate([us, sg], axis=-1)
