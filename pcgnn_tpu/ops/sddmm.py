"""SDDMM-style edge scoring over flat CSR edge lists.

The choose step's distance function — ``|s_u[0] - s_v[0]|`` over relation
edges (``src/layers.py:655-658``) — is a sampled-dense-dense operation: a
dense per-node vector evaluated at sparse edge endpoints.  This module holds
the flat-edge form used by full-graph paths; the batch-window form lives in
``ops.aggregate.choose_keep_mask``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcgnn_tpu.graph.csr import RelGraph


def edge_abs_diff(rel: RelGraph, s0: jax.Array) -> jax.Array:
    """Per-edge L1 distance on a scalar node signal.

    Args:
      rel: relation graph.
      s0: [N] per-node scalar (label-aware score channel 0).

    Returns:
      dist: [E_pad] float32; padding edges get +inf.
    """
    s0p = jnp.concatenate([s0, jnp.zeros((1,), s0.dtype)])
    row = rel.edge_rows()
    d = jnp.abs(s0p[row] - s0p[rel.col])
    return jnp.where(row < rel.num_nodes, d, jnp.inf)


def edge_ranks_global(rel: RelGraph, dist: jax.Array) -> jax.Array:
    """Per-edge ascending rank *within its CSR row*, computed with one global
    two-key sort (row, dist).  Exact; ties broken by edge order.

    Returns rank: [E_pad] int32 (padding edges get large ranks).
    """
    e = dist.shape[0]
    edge_ids = jax.lax.broadcasted_iota(jnp.int32, (e, 1), 0).squeeze(-1)
    row_s, _, ids_s = jax.lax.sort((rel.edge_rows(), dist, edge_ids),
                                   num_keys=2)
    # within-row position: sorted position minus the row's first position.
    # rows are contiguous in the sorted order and indptr gives exact starts.
    pos = jax.lax.broadcasted_iota(jnp.int32, (e, 1), 0).squeeze(-1)
    indptr_pad = jnp.concatenate(
        [rel.indptr, jnp.array([rel.num_edges], jnp.int32)])
    rank_sorted = pos - indptr_pad[jnp.minimum(row_s, rel.num_nodes)]
    rank = jnp.zeros((e,), jnp.int32).at[ids_s].set(rank_sorted)
    return rank
