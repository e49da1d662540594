"""Sequence-parallel Riccati: the horizon axis sharded over the device mesh.

This is the multi-chip form of the domain's "sequence parallelism"
(SURVEY §5.7): the OCP horizon is the sequence axis, and the associative
conditional-value reduction (solvers/riccati.py) makes the backward sweep a
prefix scan — so it distributes exactly like any parallel prefix:

  1. each device runs the reverse associative scan over its LOCAL block of
     knots (log-depth on-chip),
  2. the per-device block aggregates are all-gathered over the mesh axis
     (one small ICI collective: S elements of ~n² floats),
  3. every device folds the aggregates of all LATER blocks (plus the
     terminal boundary) into its local prefixes — the classical
     Blelchlike scan-of-scans, here over ICI instead of shared memory,
  4. gains are recovered knot-locally; merit scalars reduce with psum/pmax.

The reference's answer to long horizons was windowing (N=50 MHTT windows,
reference main/mhe/mhtt.py) because one IPOPT solve is inherently serial;
here an N=3200 sweep can spread over a pod slice with only one all-gather
of S block summaries on the critical path.

Exact same math as `riccati.backward_associative` (shared element/combine
code); equivalence is asserted on the 8-device CPU mesh in
tests/test_riccati.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aircraft_tpu.solvers.riccati import (cv_combine, cv_elements,
                                          cv_identity, cv_terminal,
                                          recover_gains)

SEQ_AXIS = "sp"


def make_seq_mesh(n_devices=None, devices=None) -> Mesh:
    """1-D mesh whose only axis carries the horizon."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (SEQ_AXIS,))


def backward_associative_sharded(mesh, A, B, lx, lu, lxx, luu, lux,
                                 vx, vxx, reg):
    """Horizon-sharded Riccati backward sweep.

    Leading (knot) axis of every per-knot array must be divisible by the
    mesh's `sp` size.  Returns the same (K, k, dv1, dv2, qu_max, fail) as
    the single-device sweeps; K, k come back sharded over `sp`.
    """
    n = A.shape[-1]
    dtype = A.dtype
    S = mesh.shape[SEQ_AXIS]
    assert A.shape[0] % S == 0, (A.shape[0], S)

    def local(A, B, lx, lu, lxx, luu, lux, vx, vxx, reg):
        idx = jax.lax.axis_index(SEQ_AXIS)

        stage, fail = cv_elements(A, B, lx, lu, lxx, luu, lux, reg)
        # local reverse scan: r[k] = e_k ⊗ ... ⊗ e_last-of-block
        r_local = jax.lax.associative_scan(
            cv_combine, stage, reverse=True, axis=0)
        agg = jax.tree_util.tree_map(lambda x: x[0], r_local)
        aggs = jax.lax.all_gather(agg, SEQ_AXIS)          # leading dim S

        # suffix(idx) = agg_{idx+1} ⊗ ... ⊗ agg_{S-1} ⊗ e_term,
        # folded late-to-early: carry_j = value(blocks j..S-1, term)
        term = cv_terminal(vx[0], vxx[0])

        def fold(carry, j):
            agg_j = jax.tree_util.tree_map(lambda x: x[j], aggs)
            new = cv_combine(carry, agg_j)
            keep = j > idx
            carry = jax.tree_util.tree_map(
                lambda a, b: jnp.where(keep, a, b), new, carry)
            return carry, None

        suffix, _ = jax.lax.scan(fold, term, jnp.arange(S - 1, -1, -1))

        # scanned[k+1] within this block: shift the local prefixes by one,
        # identity at the block's last knot (combine(suffix, id) = suffix)
        ident = cv_identity(n, dtype)
        shifted = jax.tree_util.tree_map(
            lambda x, i: jnp.concatenate(
                [x[1:], jnp.broadcast_to(i, (1,) + i.shape)], axis=0),
            r_local, ident)
        final = jax.vmap(lambda e: cv_combine(suffix, e))(shifted)

        Vx_next, Vxx_next = -final[3], final[4]
        K, k, dv1, dv2, qu, bads = recover_gains(
            A, B, lu, luu, lux, Vx_next, Vxx_next, reg)

        dv1 = jax.lax.psum(jnp.sum(dv1), SEQ_AXIS)
        dv2 = jax.lax.psum(jnp.sum(dv2), SEQ_AXIS)
        qu = jax.lax.pmax(jnp.max(qu), SEQ_AXIS)
        fail = jax.lax.psum(
            (fail | jnp.any(bads)).astype(jnp.int32), SEQ_AXIS) > 0
        return K, k, dv1, dv2, qu, fail

    shard = P(SEQ_AXIS)
    repl = P()
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(shard,) * 7 + (repl, repl, repl),
        out_specs=(shard, shard, repl, repl, repl, repl),
        check_vma=False,
    )
    # vx/vxx enter as (1, ...) so the replicated spec sees a leading axis-
    # free array on every device
    return fn(A, B, lx, lu, lxx, luu, lux, vx[None], vxx[None],
              jnp.asarray(reg, dtype))
