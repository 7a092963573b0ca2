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


# node-chunk width of the window-form SDDMM (bounds the [C, D, 8] gather)
SDDMM_NODE_CHUNK = 4096
# lane width of the broadcast score table: XLA's dynamic row gather is
# row-count-bound and pessimizes on 1-wide rows (137M rows/s) vs 8-wide
# (371M rows/s) — see RESULTS.md roofline notes
_S_BCAST = 8


def edge_abs_diff_window(rel: RelGraph, s0: jax.Array):
    """Window-layout SDDMM: dist[v, j] = |s0[v] - s0[nbr2d[v, j]]|.

    The production layout — choose consumes per-row windows
    (``src/layers.py:655-672``), never the flat edge order.  Implemented as
    chunked wide row gathers from an 8-lane broadcast of ``s0`` (element
    gathers run ~1e8 elem/s on TPU; 8-wide row gathers ~3.7e8 rows/s), the
    same schedule as ``ops.aggregate._window_mean_all_nodes``.

    On a window-capped relation (``rel.has_hubs``) this scores the capped
    window only — the same lane production aggregation sees; hub tails live
    in ``ops.hub``.

    Returns:
      dist:  [N, D] float32, +inf at invalid (padding) slots.
      valid: [N, D] bool.
    """
    if rel.is_stub:
        raise ValueError("edge_abs_diff_window called on a degree-only stub "
                         "relation (empty edge list); see degree_stub.")
    if rel.nbr2d is None:
        raise ValueError("edge_abs_diff_window needs the dense neighbor "
                         "table (rel.nbr2d); use edge_abs_diff for CSR-only "
                         "relations")
    n, d = rel.num_nodes, max(rel.window_width, 1)
    s8 = jnp.broadcast_to(s0[:, None], (n, _S_BCAST))
    s8 = jnp.concatenate([s8, jnp.zeros((1, _S_BCAST), s0.dtype)])
    c = min(SDDMM_NODE_CHUNK, n)
    nblk = -(-n // c)

    def block(i0):
        ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)[:, 0]
        ids = jnp.minimum(ids, n - 1)          # tail clamp; rows discarded
        nbr = rel.nbr2d[ids]                   # [C, D]
        degs = jnp.minimum(rel.deg[ids], d)
        offs = jax.lax.broadcasted_iota(jnp.int32, (c, d), 1)
        valid = offs < degs[:, None]
        nbr_s0 = s8[nbr][..., 0]               # [C, D] via wide row gather
        dist = jnp.abs(s0[ids][:, None] - nbr_s0)
        return jnp.where(valid, dist, jnp.inf), valid

    starts = jnp.arange(nblk, dtype=jnp.int32) * c
    dist, valid = jax.lax.map(block, starts)
    return (dist.reshape(nblk * c, d)[:n], valid.reshape(nblk * c, d)[:n])


def edge_abs_diff_window_ewin(rel: RelGraph, s0: jax.Array, w0: jax.Array,
                              b0: jax.Array):
    """Edge-window lowering of :func:`edge_abs_diff_window`: neighbor scores
    are contracted ON the contiguous-DMA feature windows
    (``s_n = xw · w0 + b0`` — the exact schedule the PC-GNN training step
    uses, ``models.pcgnn.PCGNN.forward``), removing the scattered score
    gather entirely.  The caller asserts ``s0 == snapshot_features·w0 + b0``
    (the store snapshots the graph's frozen features).

    Returns (dist [N, D] f32 with +inf at invalid slots, valid [N, D]).
    """
    if rel.ewin is None:
        raise ValueError("edge_abs_diff_window_ewin needs the edge-window "
                         "store (graph.csr.attach_edge_windows)")
    from pcgnn_tpu.ops.aggregate import batch_feature_window
    n, d = rel.num_nodes, max(rel.window_width, 1)
    f = rel.ewin_f
    c = min(SDDMM_NODE_CHUNK, n)
    nblk = -(-n // c)

    def block(i0):
        ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)[:, 0]
        ids = jnp.minimum(ids, n - 1)          # tail clamp; rows discarded
        degs = jnp.minimum(rel.deg[ids], d)
        offs = jax.lax.broadcasted_iota(jnp.int32, (c, d), 1)
        valid = offs < degs[:, None]
        xw = batch_feature_window(rel, ids, f)
        nbr_s0 = jnp.dot(xw, w0, precision="highest",
                         preferred_element_type=jnp.float32) + b0
        dist = jnp.abs(s0[ids][:, None] - nbr_s0)
        return jnp.where(valid, dist, jnp.inf), valid

    starts = jnp.arange(nblk, dtype=jnp.int32) * c
    dist, valid = jax.lax.map(block, starts)
    return (dist.reshape(nblk * c, d)[:n], valid.reshape(nblk * c, d)[:n])


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
