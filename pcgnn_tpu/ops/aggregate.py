"""Core TPU aggregation ops: batch neighbor windows, vectorized choose, and
dense-mask GEMM aggregation.

The reference implements neighbor selection with a Python loop over batch
nodes, a per-node ``torch.sort``, and a host-built dense ``[B, U]`` mask
(``src/layers.py:633-738`` and ``src/layers.py:594-624``).  Here the whole
batch is processed as fixed-shape array programs:

  1. ``batch_neighbor_window``  — gather each batch row's CSR slice into a
     padded ``[B, D]`` window (indices only; no feature traffic).
  2. ``choose_keep_mask``       — per-edge L1 distance on the label-aware
     score channel 0 (an SDDMM), exact per-row rank via double argsort, and
     a boolean keep mask ``rank < keff`` that reproduces the reference's
     top-p rule *including* its keep-all-when-small branch (folded into
     ``keff`` at graph build time, see ``graph.csr``).
  3. ``window_mean_aggregate``  — scatter-free gather + contraction mean
     over the kept window (+ oversampled minors, exactly deduplicated by
     ``dedup_minor_keep`` to reproduce the reference's *set* semantics,
     ``src/layers.py:694``).  This is the production path: the feature
     table is frozen, so no VJP through the gather exists and the whole
     fwd+bwd is scatter-free (XLA TPU scatter-add was ~90% of step time).
  4. ``scatter_batch_mask`` + ``masked_mean_aggregate`` — the dense
     ``[B, N]`` mask/GEMM form of the reference's
     ``mask.div(num_neigh).mm(embed_matrix)`` (``src/layers.py:612-624``);
     the cross-check oracle path AND the production lane of the
     learned-feature variant (``models.pcgnn`` ``learn_features``):
     the mask GEMM's VJP is itself a GEMM, so gradients flow into the
     trainable node table.

Selection is intentionally non-differentiable (as in the reference, where
gradients reach ``label_clf`` only through the similarity loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcgnn_tpu.graph.csr import RelGraph

# a python float, NOT jnp.float32(inf): a module-level jnp constant would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize (must run before any backend init)
_INF = float("inf")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def batch_neighbor_window(rel: RelGraph, batch: jax.Array,
                          *, allow_capped: bool = False):
    """Gather the CSR neighbor window for a batch of rows.

    The window is ``[B, rel.window_width]``.  On a capped relation
    (``rel.has_hubs``) rows with deg > dcap only expose their first dcap
    neighbors here; such relations are rejected unless the caller is
    hub-aware (``allow_capped=True``) and routes those rows through
    ``ops.hub`` — otherwise a truncated window would silently drop edges.

    Args:
      rel: relation graph.
      batch: [B] int32 node ids (may contain duplicates: the pick sampler
        draws with replacement, ``src/utils.py:278``).

    Returns:
      nbr:   [B, D] int32 neighbor ids, padding slots = ``rel.num_nodes``.
      valid: [B, D] bool, True where the slot holds a real neighbor
        (clamped to the cap: hub rows get exactly dcap valid slots).
    """
    if rel.is_stub:
        raise ValueError(
            "batch_neighbor_window called on a degree-only stub relation "
            "(graph.csr.degree_stub): its edge list is empty, so window "
            "aggregation would silently average zero phantom neighbors. "
            "Stubs may only feed degree consumers (the pick sampler).")
    if rel.has_hubs and not allow_capped:
        raise ValueError(
            f"batch_neighbor_window on a window-capped relation "
            f"(dcap={rel.window_width} < dmax={rel.dmax}) from a caller "
            f"that is not hub-aware: rows above the cap would silently "
            f"lose neighbors. Route hub rows through ops.hub (pass "
            f"allow_capped=True once handled), or rebuild the graph with "
            f"window_cap=None disabled (csr_from_edges(window_cap=dmax)).")
    d = max(rel.window_width, 1)
    degs = jnp.minimum(rel.deg[batch], d)            # [B]
    offs = jax.lax.broadcasted_iota(jnp.int32, (batch.shape[0], d), 1)
    valid = offs < degs[:, None]
    if rel.nbr2d is not None:
        # dense row gather: 5.7x faster than the strided CSR gather below
        # (XLA lowers the scattered pos-gather poorly on TPU)
        return rel.nbr2d[batch], valid
    starts = rel.indptr[batch]                       # [B]
    from pcgnn_tpu.ops.pallas import ragged_gather
    if ragged_gather.available():
        # each row's window is a CONTIGUOUS run col[start : start+D]; the
        # Pallas kernel turns it into per-row double-buffered DMAs instead
        # of XLA's scattered element gather (the edge array is padded by a
        # full window at build time, so no bounds checks are needed)
        d_pad = _round_up(d, 128)
        raw = ragged_gather.ragged_window_gather(rel.col, starts, d_pad)
        nbr = jnp.where(valid, raw[:, :d], rel.num_nodes)
        return nbr, valid
    pos = jnp.where(valid, starts[:, None] + offs, 0)
    nbr = jnp.where(valid, rel.col[pos], rel.num_nodes)
    return nbr, valid


def batch_feature_window(rel: RelGraph, batch: jax.Array,
                         f: int, starts: jax.Array | None = None
                         ) -> jax.Array:
    """[B, D, f] neighbor FEATURE window from the edge-materialized store.

    One contiguous DMA per batch row (``ops.pallas.window_gather``) instead
    of B·D scattered row fetches — 5.5x on v5e, and the reason the training
    step is no longer gather-bound.  Requires ``rel.ewin`` (see
    ``graph.csr.attach_edge_windows``); slots beyond a row's true degree
    hold the NEXT node's run (garbage) and MUST be masked by the caller's
    ``valid`` mask before use.
    """
    if rel.ewin is None:
        raise ValueError("batch_feature_window needs the edge-window store "
                         "(graph.csr.attach_edge_windows)")
    if f != rel.ewin_f:
        raise ValueError(
            f"batch_feature_window: requested feature width {f} != "
            f"{rel.ewin_f} the edge-window store was built with — the "
            f"store snapshots the graph's frozen features "
            f"(graph.csr.attach_edge_windows)")
    d = max(rel.window_width, 1)
    raw = batch_raw_window(rel, batch, starts)
    return unpack_window(raw, d, f, rel.ewin_fs, rel.ewin_packed)


def batch_raw_window(rel: RelGraph, batch: jax.Array,
                     starts: jax.Array | None = None) -> jax.Array:
    """[B, ewin_dp] raw store words per batch row (one contiguous DMA
    each); packed stores stay packed — unpack via :func:`unpack_window`
    or contract the halves directly (:func:`packed_window_halves`)."""
    from pcgnn_tpu.ops.pallas import window_gather
    if starts is None:
        starts = rel.estart[batch]
    return window_gather.window_gather(rel.ewin, starts, rel.ewin_dp,
                                       aligned=rel.ewin_aligned)


def unpack_window(raw: jax.Array, d: int, f: int, fs: int,
                  packed: bool) -> jax.Array:
    """[B, >=d*fw] flat gathered store rows -> [B, d, f] feature windows.

    For packed (bfloat16) stores — two values per f32 word, split-column
    packing (``graph.csr.attach_edge_windows``) — unpack with same-width
    bitcasts only: a bf16 upcast is exactly "append 16 zero bits", so low
    half = word << 16, high half = word & 0xffff0000.  Only the stored
    feature VALUES round; downstream stays f32.
    """
    b = raw.shape[0]
    if packed:
        fs = fs or f
        w = raw[:, : d * (fs // 2)].reshape(b, d, fs // 2)
        u = jax.lax.bitcast_convert_type(w, jnp.uint32)
        lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
        hi = jax.lax.bitcast_convert_type(
            u & jnp.uint32(0xFFFF0000), jnp.float32)
        return jnp.concatenate([lo, hi], axis=-1)[..., :f]
    return raw[:, : d * f].reshape(b, d, f)


def batch_record_window(graph, batch: jax.Array) -> jax.Array:
    """[B, W] fused per-node records: EVERY relation's neighbor-feature
    window in ONE row fetch per batch row (``graph.csr._build_fused_store``).
    A plain XLA 2D row gather — at the fused record width XLA's gather is
    bandwidth-bound and beats the one-DMA-per-row kernel (probed on v5e).
    Slice relation r's section at ``graph.fused_off[r]`` and unpack with
    :func:`unpack_window`.
    """
    if graph.fused is None:
        raise ValueError("batch_record_window needs the fused record store "
                         "(graph.csr.materialize_edge_windows(fused=True))")
    return graph.fused[batch]


def self_union_feature_window(rel: RelGraph, batch: jax.Array,
                              features: jax.Array):
    """Edge-window form of ``batch_neighbor_window`` + ``union_self_window``
    + ``x_padded[nbr]`` in one: the contiguous-DMA feature window with a
    conditional self column appended (active only where the row's CSR lacks
    the self-loop, matching the reference's set union,
    ``src/graphsage.py:79,210``).

    Returns (xw [B, D+1, F], keep [B, D+1]).
    """
    f = features.shape[1]
    d = max(rel.window_width, 1)
    degs = jnp.minimum(rel.deg[batch], d)
    offs = jax.lax.broadcasted_iota(jnp.int32, (batch.shape[0], d), 1)
    valid = offs < degs[:, None]
    nbr = rel.nbr2d[batch]
    xw = batch_feature_window(rel, batch, f)
    present = jnp.any((nbr == batch[:, None]) & valid, axis=1)
    xw = jnp.concatenate([xw, features[batch][:, None, :]], axis=1)
    keep = jnp.concatenate([valid, ~present[:, None]], axis=1)
    return xw, keep


def row_ranks(dist: jax.Array) -> jax.Array:
    """Exact per-row ascending rank of ``dist`` (ties broken by column index).

    rank[b, j] = |{j' : dist[b,j'] < dist[b,j] or (== and j' < j)}|.
    Implemented as argsort-of-argsort; both sorts are stable.
    """
    order = jnp.argsort(dist, axis=-1, stable=True)
    return jnp.argsort(order, axis=-1, stable=True).astype(jnp.int32)


def keep_nearest(dist: jax.Array, k: jax.Array,
                 valid: jax.Array) -> jax.Array:
    """Boolean mask of each row's ``k[b]`` nearest entries of ``dist``.

    Exactly equivalent to ``valid & (row_ranks(dist) < k[:, None])`` — the
    choose rule with stable (value, column) ordering — but computed with ONE
    single-operand value sort instead of two index-carrying argsorts:

      t        = k-th smallest value per row (from the sorted copy)
      keep     = dist < t                     (all strictly-nearer entries;
                                               there are at most k-1 of them)
               | ties at t, first (k - #nearer) in column order
                                              (inclusive prefix count)

    ``dist`` must already be +inf at invalid slots (so they sort last).
    """
    b, d = dist.shape
    ds = jax.lax.sort(dist)                               # [B, D] ascending
    idx = jnp.clip(k - 1, 0, d - 1)
    # k-th smallest per row, via masked sum instead of take_along_axis: a
    # TPU gather pays a fixed dispatch cost (~30us) that a fused
    # compare+select does not.  +inf at the picked slot survives the
    # where (no inf*0).
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, d), 1)
    t = jnp.sum(jnp.where(cols == idx[:, None], ds, 0.0), axis=1,
                keepdims=True)                            # [B, 1] threshold
    less = dist < t
    eq = dist == t
    tie_prefix = jnp.cumsum(eq.astype(jnp.int32), axis=1)
    n_less = jnp.sum(less, axis=1, keepdims=True)
    keep_tie = eq & ((n_less + tie_prefix) <= k[:, None])
    return valid & (k[:, None] > 0) & (less | keep_tie)


def choose_keep_mask(
    rel: RelGraph,
    batch: jax.Array,
    nbr: jax.Array,
    valid: jax.Array,
    s0_padded: jax.Array,
) -> jax.Array:
    """The *choose* step: keep each row's ``keff`` nearest neighbors.

    Distance is the L1 difference of label-aware score channel 0 between the
    center and the neighbor (``src/layers.py:655-658``).  ``s0_padded`` is
    ``[N+1]`` (one dummy row for padding ids).

    Returns keep: [B, D] bool.
    """
    center = s0_padded[batch]                     # [B]
    d = jnp.abs(center[:, None] - s0_padded[nbr])  # SDDMM over the window
    d = jnp.where(valid, d, _INF)
    return keep_nearest(d, rel.keff[batch], valid)


def oversample_candidates_dense(
    batch: jax.Array,
    s0_padded: jax.Array,
    train_pos: jax.Array,
    train_pos_valid: jax.Array,
    m_max: int,
):
    """Id-based wrapper over :func:`oversample_candidates_dense_values`."""
    return oversample_candidates_dense_values(
        s0_padded[batch], s0_padded[train_pos], train_pos, train_pos_valid,
        m_max)


def oversample_candidates_dense_values(
    center_s0: jax.Array,
    cand_s0: jax.Array,
    train_pos: jax.Array,
    train_pos_valid: jax.Array,
    m_max: int,
):
    """Dense-oracle form of :func:`oversample_candidates`: ``top_k`` over the
    full [B, P] distance matrix.  Ties resolve to the lowest candidate slot
    (same as the reference's stable ascending sort over the ``train_pos``
    tensor, ``src/layers.py:679-683``).  O(B·P) — kept as the cross-check
    oracle; the production path below is O(P log P + B·M)."""
    p = int(train_pos.shape[0])
    center = center_s0                                      # [B]
    d = jnp.abs(center[:, None] - cand_s0[None, :])         # [B, P]
    d = jnp.where(train_pos_valid[None, :], d, _INF)
    k = min(m_max, p)
    if 2 * k >= p:
        # k ~ P (skew graphs: a hub's ksample*rho can exceed the whole
        # candidate pool).  top_k at [1024, 2688] k~P plus the [B, k]
        # element gathers of ids/valid by `order` measured ~42 ms/step on
        # v5e; ONE stable value sort carrying slots/ids/valid as ride-along
        # operands is ~3 ms with the SAME tie rule (stable sort = lowest
        # slot wins, as top_k).
        bcast = lambda a: jnp.broadcast_to(a[None, :], d.shape)
        ds, slots_s, ids_s, val_s = jax.lax.sort(
            (d, bcast(jnp.arange(p, dtype=jnp.int32)),
             bcast(train_pos.astype(jnp.int32)),
             bcast(train_pos_valid.astype(jnp.int32))), num_keys=1)
        cand_dist = ds[:, :k]
        cand_slots = slots_s[:, :k]
        cand_ids = ids_s[:, :k]
        cand_valid = (val_s[:, :k] > 0) & jnp.isfinite(cand_dist)
    else:
        neg_top, order = jax.lax.top_k(-d, k)               # [B, k]
        cand_ids = train_pos[order]
        cand_valid = train_pos_valid[order] & jnp.isfinite(neg_top)
        cand_dist = -neg_top
        cand_slots = order.astype(jnp.int32)
    if k < m_max:  # fewer candidates than the static bound: pad invalid
        padw = m_max - k
        cand_ids = jnp.pad(cand_ids, ((0, 0), (0, padw)))
        cand_valid = jnp.pad(cand_valid, ((0, 0), (0, padw)))
        cand_dist = jnp.pad(cand_dist, ((0, 0), (0, padw)),
                            constant_values=_INF)
        cand_slots = jnp.pad(cand_slots, ((0, 0), (0, padw)))
    return cand_ids, cand_valid, cand_dist, cand_slots


def oversample_candidates(
    batch: jax.Array,
    s0_padded: jax.Array,
    train_pos: jax.Array,
    train_pos_valid: jax.Array,
    m_max: int,
):
    """Id-based wrapper over :func:`oversample_candidates_values` (gathers
    the centers' and candidates' scores from the [N+1] score table)."""
    return oversample_candidates_values(
        s0_padded[batch], s0_padded[train_pos], train_pos, train_pos_valid,
        m_max)


def oversample_candidates_values(
    center_s0: jax.Array,
    cand_s0: jax.Array,
    train_pos: jax.Array,
    train_pos_valid: jax.Array,
    m_max: int,
):
    """Per-row nearest training positives, compacted to the static bound.

    The reference appends, for each fraud-labeled center, the
    ``int(ceil(thr*deg)*rho)`` training positives nearest in label-aware
    score (``src/layers.py:675-691``).  The candidate ordering is
    relation-independent, so it is computed once per step.

    The distance ``|s_c - s_p|`` is one-dimensional, so the ``m`` nearest
    candidates of any center form a *contiguous window* of the score-sorted
    candidate list.  Instead of a ``top_k`` over the dense [B, P] distance
    matrix (the single most expensive op of the training step on TPU, and
    O(B·P) with P ~ 1e5 at stress scale), this:

      1. sorts candidate scores once:            O(P log P), one [P] sort
      2. binary-searches each center's position: O(B log P)
      3. lexicographically sorts a [B, 2M] window by (distance, slot)

    Tie-breaking matches the dense oracle (lowest candidate slot wins)
    whenever the tied candidates fall inside the 2M window.  When a run of
    *exactly* equal f32 distances extends beyond the window (possible only
    with exactly-tied scores, e.g. duplicated feature rows), the selected
    tied subset may differ from the oracle's slot order — the selected
    distance multiset is still exact, which is the tie-robust parity target
    (SURVEY.md §7 "hard parts": the reference's own tie order is
    set-iteration-dependent).

    Returns:
      cand_ids:   [B, m_max] int32 nearest train_pos ids, ascending distance.
      cand_valid: [B, m_max] bool (False where padding entries sorted in).
      cand_dist:  [B, m_max] f32 the (exact) candidate distances, ascending;
        +inf at invalid slots.  Row m-1 is the dedup threshold the hub lane
        uses to spot kept neighbors that are also selected minors.
      cand_slots: [B, m_max] int32 candidate positions into ``train_pos``
        (0 at invalid slots) — lets consumers gather minor features from
        the COMPACT [P, F] train-positive table (``minor_sum_compact``)
        instead of the full node table.
    """
    p = int(train_pos.shape[0])
    if 2 * m_max >= p:
        return oversample_candidates_dense_values(
            center_s0, cand_s0, train_pos, train_pos_valid, m_max)

    center = center_s0                                      # [B]
    sp = jnp.where(train_pos_valid, cand_s0, _INF)          # [P]
    slot = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
    # sort candidates by (score, slot); invalid slots cluster at the end.
    # train_pos ids ride the SAME sort: the former post-sort
    # train_pos[slot_sorted] was a [P] element gather — ~2 ms/step at
    # stress scale (P ~ 2e5; TPU element gathers run ~1e8 elem/s)
    sp_sorted, slot_sorted, tp_sorted = jax.lax.sort(
        (sp, slot, train_pos.astype(jnp.int32)), num_keys=1)
    # Each center's m nearest live in the contiguous window
    # [pos-m, pos+m) of the sorted array.  A per-row [B, 2M] element gather
    # of that window is the slow path on TPU (XLA's scattered element
    # gather runs ~1e8 elem/s); instead the sorted array is chunked into
    # overlapping rows of width 2C (chunk stride C >= 2M), so any window is
    # contained in ONE row and the extraction becomes a fast wide row
    # gather of a [B, 2C] superset, lex-sorted directly (no in-register
    # window shift needed).
    c = max(128, _round_up(2 * m_max, 128))                 # chunk stride
    nrows = -(-p // c)
    ppad = nrows * c + c
    padw = ppad - p
    sp_pad = jnp.pad(sp_sorted, (0, padw), constant_values=_INF)
    slot_pad = jnp.pad(slot_sorted, (0, padw), constant_values=0)

    def overlap_rows(a):                                    # [Ppad] -> [R, 2C]
        return jnp.concatenate(
            [a[:nrows * c].reshape(nrows, c),
             a[c:nrows * c + c].reshape(nrows, c)], axis=1)

    # tie-break slots and the train_pos ids ride ONE packed INT row gather
    # (recovering ids afterwards with train_pos[slots_out] would be a
    # [B, M] *element* gather — measured ~0.4 ms at B=1024; element
    # gathers run ~1e8 elem/s on v5e while wide row gathers are ~100x
    # faster per fetched byte).  The ints stay int32 the whole way: an
    # earlier version bitcast them through f32 to share the score gather,
    # but small ints are f32 DENORMALS and XLA's TPU row gather flushes
    # denormals to zero — every slot/id arrived as 0 on hardware while CPU
    # tests passed (caught by the round-5 on-chip oracle check).
    tp_pad = jnp.pad(tp_sorted, (0, padw), constant_values=0)
    rows_scores = overlap_rows(sp_pad)                      # [R, 2C] f32
    rows_ints = jnp.concatenate(
        [overlap_rows(slot_pad), overlap_rows(tp_pad)], axis=1)  # [R, 4C] i32
    b_sz = int(center.shape[0])
    # compare_all builds a fused [B, P] compare matrix — far cheaper than
    # the default 'scan' binary search (log P sequential tiny kernels) up
    # to a few-MB matrix; large candidate pools keep the scan
    method = "compare_all" if p * b_sz <= 8_000_000 else "scan"
    pos = jnp.searchsorted(sp_sorted, center, method=method)  # [B]
    r0 = jnp.clip((pos - m_max) // c, 0, nrows - 1)         # [B]
    win_scores = rows_scores[r0]                            # [B, 2C] row gather
    win_ints = rows_ints[r0]                                # [B, 4C] row gather
    win_slots = win_ints[:, : 2 * c]
    win_tpids = win_ints[:, 2 * c:]
    d = jnp.abs(center[:, None] - win_scores)
    d = jnp.where(jnp.isfinite(win_scores), d, _INF)
    # lexicographic (distance, slot) sort reproduces the oracle's stable
    # tie order (equal distances can come from both sides of the center, so
    # window order alone is NOT the slot order); take the m_max nearest.
    # The ids are carried as a third sort operand instead of re-gathered.
    d_sorted, slots_out, tpids_out = jax.lax.sort((d, win_slots, win_tpids),
                                                  num_keys=2)
    d_sorted = d_sorted[:, :m_max]
    cand_valid = jnp.isfinite(d_sorted)
    # invalid slots carry id/slot 0 (in bounds; every consumer masks on
    # cand_valid / keep_minor before use)
    cand_ids = jnp.where(cand_valid, tpids_out[:, :m_max], 0)
    cand_slots = jnp.where(cand_valid, slots_out[:, :m_max], 0)
    return cand_ids, cand_valid, d_sorted, cand_slots


def oversample_keep(
    rel: RelGraph,
    batch: jax.Array,
    batch_labels: jax.Array,
    cand_valid: jax.Array,
    rho: float,
    ksample_b: jax.Array | None = None,
) -> jax.Array:
    """Keep mask over the compact candidate window: slot r is kept when
    ``r < int(ksample * rho)`` and the center is fraud-labeled.
    num_oversample uses the *unclamped* sample count ceil(thr*deg),
    not keff (``src/layers.py:653,681``).

    ``ksample_b`` optionally supplies the already-gathered ``ksample[batch]``
    (the packed ``rel.meta`` row gather) to avoid a separate element gather.

    Returns keep_minor: [B, m_max] bool.
    """
    if ksample_b is None:
        ksample_b = rel.ksample[batch]
    m = jnp.floor(ksample_b.astype(jnp.float32) * rho).astype(jnp.int32)
    slot = jax.lax.broadcasted_iota(jnp.int32, cand_valid.shape, 1)
    is_fraud = (batch_labels == 1)
    return cand_valid & (slot < m[:, None]) & is_fraud[:, None]


def scatter_batch_mask(
    num_nodes: int,
    nbr: jax.Array,
    keep: jax.Array,
    minor_ids: jax.Array | None = None,
    keep_minor: jax.Array | None = None,
) -> jax.Array:
    """Scatter kept neighbors (and oversampled minors) into a dense [B, N]
    0/1 mask with set semantics (duplicates clamp to 1).

    This is the mask-GEMM lane (the reference's ``src/layers.py:594-624``
    formulation) — the cross-check oracle, and the right path when
    gradients must flow into the feature table (learned embeddings).  On
    TPU the XLA scatter-add lowers to a serialized update loop, so the
    build dispatches to the compare-based Pallas kernel
    (``ops.pallas.mask_build``) when it is available; the minors window
    is folded in by column concatenation (OR-accumulation = the same set
    semantics).
    """
    from pcgnn_tpu.ops.pallas import mask_build
    if mask_build.available():
        nbr_all, keep_all = nbr, keep
        if minor_ids is not None:
            mids = (jnp.broadcast_to(minor_ids[None, :], keep_minor.shape)
                    if minor_ids.ndim == 1 else minor_ids)
            nbr_all = jnp.concatenate([nbr, mids], axis=1)
            keep_all = jnp.concatenate([keep, keep_minor], axis=1)
        return mask_build.build_batch_mask(nbr_all, keep_all, num_nodes)
    b = nbr.shape[0]
    mask = jnp.zeros((b, num_nodes + 1), dtype=jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, nbr.shape, 0)
    mask = mask.at[rows, nbr].add(keep.astype(jnp.float32), mode="drop")
    if minor_ids is not None:
        rows_m = jax.lax.broadcasted_iota(jnp.int32, keep_minor.shape, 0)
        cols_m = (jnp.broadcast_to(minor_ids[None, :], keep_minor.shape)
                  if minor_ids.ndim == 1 else minor_ids)
        mask = mask.at[rows_m, cols_m].add(keep_minor.astype(jnp.float32), mode="drop")
    mask = jnp.minimum(mask, 1.0)
    return mask[:, :num_nodes]


def masked_mean_aggregate(mask: jax.Array, features: jax.Array,
                          *, norm: str = "mean") -> jax.Array:
    """Aggregate features through a dense [B, N] mask on the MXU.

    norm='mean'  -> mask.div(rowsum)        (``src/layers.py:612-614``)
    norm='sqrt'  -> mask.div(sqrt(rowsum))  (GCN, ``src/graphsage.py:224-226``)
    """
    cnt = jnp.sum(mask, axis=1, keepdims=True)
    if norm == "mean":
        denom = jnp.maximum(cnt, 1.0)
    elif norm == "sqrt":
        denom = jnp.sqrt(jnp.maximum(cnt, 1.0))
    else:
        raise ValueError(f"unknown norm {norm!r}")
    mask = mask / denom
    return jnp.dot(mask, features, preferred_element_type=jnp.float32)


def dedup_minor_keep(nbr: jax.Array, keep: jax.Array, sentinel: int,
                     cand_ids: jax.Array, keep_minor: jax.Array) -> jax.Array:
    """Drop oversampled candidates that are already kept neighbors.

    The reference accumulates selected neighbors and oversampled minors into
    one Python *set* (``src/layers.py:694``), so duplicates collapse.  The
    gather-based aggregation path sums both groups, which would double-count;
    this exact correction removes the overlap with a broadcast equality
    over the compact window: [B, M, D] compares, fully VPU-vectorized (a
    vmapped searchsorted lowered to a 50x slower scan loop on TPU).  Wide
    candidate windows (skew graphs: M grows with ceil(thr·dmax)·rho) run
    the compare in ``MINOR_CHUNK`` blocks so the bool intermediate stays
    O(B·chunk·D); selection is non-differentiable, so the block loop needs
    no VJP.
    """
    kept_ids = jnp.where(keep, nbr, sentinel)                     # [B, D]
    b, m = cand_ids.shape
    if m <= MINOR_CHUNK:
        dup = jnp.any(cand_ids[:, :, None] == kept_ids[:, None, :], axis=2)
        return keep_minor & ~dup
    c = MINOR_CHUNK
    nblk = -(-m // c)
    ids = jax.lax.stop_gradient(cand_ids)
    if nblk * c != m:
        ids = jnp.pad(ids, ((0, 0), (0, nblk * c - m)),
                      constant_values=sentinel)
    kept_ids = jax.lax.stop_gradient(kept_ids)

    def body(j, out):
        idb = jax.lax.dynamic_slice(ids, (0, j * c), (b, c))
        dup = jnp.any(idb[:, :, None] == kept_ids[:, None, :], axis=2)
        return jax.lax.dynamic_update_slice(out, dup, (0, j * c))

    dup = jax.lax.fori_loop(0, nblk, body, jnp.zeros((b, nblk * c), bool))
    return keep_minor & ~dup[:, :m]


def union_self_window(nbr: jax.Array, valid: jax.Array, batch: jax.Array):
    """Append a self column to the neighbor window, active only where the
    node is not already its own neighbor — the set-correct form of the
    reference's unconditional self union (``src/graphsage.py:79,210``)."""
    present = jnp.any((nbr == batch[:, None]) & valid, axis=1)
    nbr2 = jnp.concatenate([nbr, batch[:, None]], axis=1)
    keep2 = jnp.concatenate([valid, ~present[:, None]], axis=1)
    return nbr2, keep2


def window_mean_aggregate(
    nbr: jax.Array,
    keep: jax.Array,
    features_padded: jax.Array,
    minor_ids: jax.Array | None = None,
    keep_minor: jax.Array | None = None,
    *,
    norm: str = "mean",
) -> jax.Array:
    """Scatter-free mean aggregation over the batch neighbor window.

      agg[b] = ( Σ_j keep[b,j] · x[nbr[b,j]] + Σ_p keep_minor[b,p] · x[tp[p]] )
               / (Σ keep + Σ keep_minor)

    Mathematically identical to ``scatter_batch_mask`` +
    ``masked_mean_aggregate`` *given* ``keep_minor`` already deduplicated
    against kept neighbors (``dedup_minor_keep``), but with no scatter: on
    TPU, XLA scatter-add dominated the training step (~90% of step time),
    while this path is pure gather + contraction.  Valid because the feature
    table is frozen (reference ``model_handler.py:86``: requires_grad=False),
    so no VJP through the gather is ever needed.

    ``features_padded`` is [N+1, F] with a zero row for the padding sentinel.
    """
    kf = keep.astype(features_padded.dtype)
    num = jnp.einsum("bd,bdf->bf", kf, features_padded[nbr])
    cnt = jnp.sum(kf, axis=1)
    if minor_ids is not None:
        km = keep_minor.astype(features_padded.dtype)
        if minor_ids.ndim == 1:      # shared candidate vector [P]
            num = num + jnp.einsum("bp,pf->bf", km, features_padded[minor_ids])
        else:                        # per-row compact candidates [B, M]
            num = num + jnp.einsum("bm,bmf->bf", km, features_padded[minor_ids])
        cnt = cnt + jnp.sum(km, axis=1)
    if norm == "mean":
        denom = jnp.maximum(cnt, 1.0)
    elif norm == "sqrt":  # GCN row normalization (src/graphsage.py:224-226)
        denom = jnp.sqrt(jnp.maximum(cnt, 1.0))
    else:
        raise ValueError(f"unknown norm {norm!r}")
    return num / denom[:, None]


def window_mean_from_gathered(
    xw: jax.Array,
    keep: jax.Array,
    minor_xw: jax.Array | None = None,
    keep_minor: jax.Array | None = None,
    *,
    norm: str = "mean",
) -> jax.Array:
    """Mean aggregation over *pre-gathered* window features.

    Same math as ``window_mean_aggregate`` but takes ``xw = xs[nbr]``
    ([B, D, F]) directly.  Motivation: XLA's scattered element gather runs
    ~100M elem/s on TPU, while wide row gathers are fast; the PC-GNN forward
    therefore appends the label-aware score as an extra feature column and
    gathers each window ONCE, feeding choose and aggregation from the same
    [B, D, F+1] block (see ``models.pcgnn.PCGNN.forward``).
    """
    kf = keep.astype(xw.dtype)
    num = jnp.einsum("bd,bdf->bf", kf, xw)
    cnt = jnp.sum(kf, axis=1)
    if minor_xw is not None:
        km = keep_minor.astype(xw.dtype)
        num = num + jnp.einsum("bm,bmf->bf", km, minor_xw)
        cnt = cnt + jnp.sum(km, axis=1)
    if norm == "mean":
        denom = jnp.maximum(cnt, 1.0)
    elif norm == "sqrt":
        denom = jnp.sqrt(jnp.maximum(cnt, 1.0))
    else:
        raise ValueError(f"unknown norm {norm!r}")
    return num / denom[:, None]


def window_sum_from_gathered(xw: jax.Array, keep: jax.Array):
    """Unnormalized form of ``window_mean_from_gathered``:
    returns (num [B, F], cnt [B]) so callers can merge several lanes
    (window / hub / minors) before the final mean division."""
    kf = keep.astype(xw.dtype)
    num = jnp.einsum("bd,bdf->bf", kf, xw)
    return num, jnp.sum(kf, axis=1)


# per-row minor-candidate gathers above this width run blockwise so the
# [B, M, F] buffer never materializes (hub fraud centers request
# int(ceil(thr*deg)*rho) minors, src/layers.py:681 — O(deg) by design)
MINOR_CHUNK = 128


def minor_sum(xs_padded: jax.Array, cand_ids: jax.Array,
              keep_minor: jax.Array, f: int):
    """(num [B, f], cnt [B]) of selected oversampled minors.

    ``xs_padded`` is the [N+1, FC] padded feature(+extra columns) table;
    only the first ``f`` columns aggregate.  Wide candidate windows are
    processed in ``MINOR_CHUNK`` blocks: memory stays O(B·chunk·f)
    instead of O(B·M·f).  Selection is non-differentiable and the feature
    table frozen, so the block loop needs no VJP (see module docstring).
    """
    b, m = cand_ids.shape
    if m <= MINOR_CHUNK:
        km = keep_minor.astype(xs_padded.dtype)
        num = jnp.einsum("bm,bmf->bf", km, xs_padded[cand_ids][..., :f])
        return num, jnp.sum(km, axis=1)
    ids = jax.lax.stop_gradient(cand_ids)
    km_all = jax.lax.stop_gradient(keep_minor)
    c = MINOR_CHUNK
    nblk = -(-m // c)
    if nblk * c != m:  # pad to a whole number of blocks (invalid slots)
        ids = jnp.pad(ids, ((0, 0), (0, nblk * c - m)))
        km_all = jnp.pad(km_all, ((0, 0), (0, nblk * c - m)))

    def body(j, acc):
        num, cnt = acc
        idb = jax.lax.dynamic_slice(ids, (0, j * c), (b, c))
        kmb = jax.lax.dynamic_slice(km_all, (0, j * c), (b, c))
        km = kmb.astype(xs_padded.dtype)
        num = num + jnp.einsum("bm,bmf->bf", km, xs_padded[idb][..., :f])
        return num, cnt + jnp.sum(km, axis=1)

    return jax.lax.fori_loop(
        0, nblk, body,
        (jnp.zeros((b, f), xs_padded.dtype), jnp.zeros((b,), xs_padded.dtype)))


def minor_sum_compact(tp_feats: jax.Array, cand_slots: jax.Array,
                      keep_minor: jax.Array):
    """(num [B, F], cnt [B]) of selected oversampled minors, gathered from
    the COMPACT [P, F] train-positive feature table by candidate slot.

    Same rows exactly as ``minor_sum``'s full-table gather
    (``tp_feats[slot] == x[train_pos[slot]]``), but the gather addresses a
    KB-scale table instead of the whole node table.  Wide candidate
    windows run in ``MINOR_CHUNK`` blocks (memory O(B·chunk·F)); selection
    is non-differentiable and the features frozen, so no VJP is needed.
    """
    return minor_sum_compact_multi(tp_feats, cand_slots, [keep_minor])[0]


def minor_sum_compact_multi(tp_feats: jax.Array, cand_slots: jax.Array,
                            keeps: list):
    """``minor_sum_compact`` for SEVERAL relations sharing one candidate
    window: the chunked ``[B, chunk, F]`` feature gather — the dominant
    cost, and relation-independent — runs ONCE per chunk, and each
    relation contracts it with its own keep mask (measured ~3x on
    yelp-skew, where M reaches the whole candidate pool).

    Returns ``[(num [B, F], cnt [B]), ...]``, one pair per keep mask.
    """
    b, m = cand_slots.shape
    p, f = tp_feats.shape
    tp_feats = jax.lax.stop_gradient(tp_feats)
    slots = jnp.clip(jax.lax.stop_gradient(cand_slots), 0, p - 1)
    if m <= MINOR_CHUNK:
        xg = tp_feats[slots]
        out = []
        for keep in keeps:
            km = keep.astype(tp_feats.dtype)
            out.append((jnp.einsum("bm,bmf->bf", km, xg),
                        jnp.sum(km, axis=1)))
        return out
    c = MINOR_CHUNK
    nblk = -(-m // c)
    kms = [jax.lax.stop_gradient(k) for k in keeps]
    if nblk * c != m:
        slots = jnp.pad(slots, ((0, 0), (0, nblk * c - m)))
        kms = [jnp.pad(k, ((0, 0), (0, nblk * c - m))) for k in kms]

    def body(j, acc):
        sb = jax.lax.dynamic_slice(slots, (0, j * c), (b, c))
        xg = tp_feats[sb]
        out = []
        for (num, cnt), k_all in zip(acc, kms):
            kb = jax.lax.dynamic_slice(k_all, (0, j * c), (b, c))
            km = kb.astype(tp_feats.dtype)
            out.append((num + jnp.einsum("bm,bmf->bf", km, xg),
                        cnt + jnp.sum(km, axis=1)))
        return tuple(out)

    zero = tuple((jnp.zeros((b, f), tp_feats.dtype),
                  jnp.zeros((b,), tp_feats.dtype)) for _ in keeps)
    return list(jax.lax.fori_loop(0, nblk, body, zero))


def minor_dedup_threshold(rel: RelGraph, batch: jax.Array,
                          batch_labels: jax.Array, cand_valid: jax.Array,
                          cand_dist: jax.Array, rho: float) -> jax.Array:
    """[B] distance threshold for the hub lane's duplicate detection.

    A kept hub neighbor c duplicates a selected minor iff c is a valid
    train positive and its choose distance places it within the row's
    m = int(ksample·rho) nearest candidates.  Because the candidate list
    is distance-sorted, that reduces to d(c) <= cand_dist[b, m-1] — with
    -inf when the row selects no minors (not fraud / m == 0) and +inf
    when every valid candidate is selected (m >= #valid).  Ties at the
    threshold resolve inclusively (the tie-robust parity target:
    SURVEY.md §7 "hard parts").
    """
    m = jnp.floor(rel.ksample[batch].astype(jnp.float32) * rho).astype(jnp.int32)
    n_valid = jnp.sum(cand_valid.astype(jnp.int32), axis=1)
    m_max = cand_dist.shape[1]
    idx = jnp.clip(m - 1, 0, m_max - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, cand_dist.shape, 1)
    at_m = jnp.sum(jnp.where(cols == idx[:, None], cand_dist, 0.0), axis=1)
    thresh = jnp.where(m >= n_valid, _INF, at_m)
    active = (batch_labels == 1) & (m > 0)
    return jnp.where(active, thresh, -_INF)


# node-chunk width of the window-form full-graph SpMM: bounds the gathered
# [C, D, F] block (~25 MB at yelp scale).  Swept on v5e (yelp-like, E=6.8M):
# 1024 -> 29.3 ms, 2048 -> 46.0, 4096 -> 37.3, 8192 -> 63.1, unchunked ->
# 67.5; 1024 runs at the pure row-gather bound (~330M rows/s).
SPMM_NODE_CHUNK = 1024


def segment_mean_spmm(rel: RelGraph, features: jax.Array,
                      keep: jax.Array | None = None,
                      *, assume_ewin_features: bool = False) -> jax.Array:
    """Full-graph mean aggregation h[v] = mean_{u in N(v)} x[u].

    Three lowerings (same math, oracle-tested equal):
      * edge-window form (``assume_ewin_features=True`` and the relation
        carries the edge-materialized store): chunked contiguous-DMA
        window gathers (ops.pallas.window_gather) + einsum.  Opt-in
        because the store snapshots the *graph's* features at
        ``attach_edge_windows`` time — the caller asserts the ``features``
        argument is that same table.
      * window form (default when the dense neighbor table exists and no
        edge filter is given): chunked [C, D] row gather + einsum — the
        same scatter-free shape as the training path.  Measured 8x faster
        than the segment form on v5e (benchmarks/roofline.py): XLA lowers
        ``segment_sum`` as scatter-add (~0.5% of the streaming roofline)
        while dynamic row gathers run at ~330M rows/s.
      * segment form (fallback; also the ``keep``-filter path since the
        flat [E_pad] filter matches the flat edge layout): gather + sorted
        ``segment_sum`` over the flat edge list.
    """
    if rel.is_stub:
        raise ValueError("segment_mean_spmm called on a degree-only stub "
                         "relation (empty edge list); see degree_stub.")
    n = rel.num_nodes
    feats_pad = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), features.dtype)], axis=0)
    use_ewin = (assume_ewin_features and rel.ewin is not None
                and keep is None and not rel.has_hubs)
    if keep is None and rel.nbr2d is not None and not rel.has_hubs:
        return _window_mean_all_nodes(rel, feats_pad,
                                      use_ewin=use_ewin)[:n]
    row = rel.edge_rows()
    vals = feats_pad[rel.col]                                # [E_pad, F]
    w = (row < n)
    if keep is not None:
        w = w & keep
    vals = vals * w[:, None].astype(features.dtype)
    seg = jax.ops.segment_sum(vals, row, num_segments=n + 1,
                              indices_are_sorted=True)
    cnt = jax.ops.segment_sum(w.astype(features.dtype), row,
                              num_segments=n + 1, indices_are_sorted=True)
    out = seg[:n] / jnp.maximum(cnt[:n, None], 1.0)
    return out


def _window_mean_all_nodes(rel: RelGraph, feats_pad: jax.Array,
                           *, use_ewin: bool = False) -> jax.Array:
    """[N_pad, F] neighbor mean over every node, in SPMM_NODE_CHUNK blocks
    (each block is one wide row gather — or one contiguous-DMA window batch
    when ``use_ewin`` — + masked einsum; lax.map keeps peak memory at one
    [C, D, F] block)."""
    n, d = rel.num_nodes, max(rel.window_width, 1)
    f = feats_pad.shape[1]
    c = min(SPMM_NODE_CHUNK, n)
    nblk = -(-n // c)
    n_pad = nblk * c

    def block(i0):
        ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)[:, 0]
        ids = jnp.minimum(ids, n - 1)          # tail clamp; rows discarded
        degs = jnp.minimum(rel.deg[ids], d)
        offs = jax.lax.broadcasted_iota(jnp.int32, (c, d), 1)
        valid = (offs < degs[:, None]).astype(feats_pad.dtype)
        if use_ewin:
            xw = batch_feature_window(rel, ids, f)
        else:
            xw = feats_pad[rel.nbr2d[ids]]     # [C, D, F]
        num = jnp.einsum("cd,cdf->cf", valid, xw)
        cnt = jnp.sum(valid, axis=1)
        return num / jnp.maximum(cnt, 1.0)[:, None]

    starts = jnp.arange(nblk, dtype=jnp.int32) * c
    out = jax.lax.map(block, starts)           # [nblk, C, F]
    return out.reshape(n_pad, f)
