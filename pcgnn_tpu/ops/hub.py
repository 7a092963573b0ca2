"""Blockwise hub-row aggregation lane.

The window lane (``ops.aggregate``) materializes a ``[B, dcap, F]`` gather
per relation.  On heavy-tailed graphs — the reference's YelpChi RSR relation
links entire same-star-same-month cliques (``src/utils.py:72-91``), giving a
global max degree orders of magnitude above the mean — sizing that window by
``dmax`` is exactly the reference's dense ``[B, U]`` blow-up
(``src/layers.py:594-608``) renamed.  Here rows with deg > dcap ("hubs") are
compacted to the front of the batch and processed in fixed chunks, each
chunk sweeping its CSR edge tail in fixed-width blocks, so per-step memory
is O(chunk·block·F) and compute is proportional to the *touched* hub edges
(dynamic trip counts), not B × dmax.

Choose semantics are unchanged: per row keep the ``keff`` nearest neighbors
by the label-aware score distance (``src/layers.py:655-672``), with the
keep-all-when-small rule folded into ``keff`` at graph build time.  The two
sweeps per chunk are

  pass 1: gather neighbor score rows blockwise -> full [chunk, dmax_pad]
          distance buffer -> exact per-row rank threshold (one sort).
  pass 2: gather feature rows blockwise, accumulate the kept mean, and
          subtract neighbors that duplicate selected oversampled minors
          (the reference collapses both groups into one Python set,
          ``src/layers.py:694``): a kept neighbor c duplicates iff c is a
          valid train positive and d(c) <= the row's minor-selection
          threshold (``ops.aggregate.minor_dedup_threshold``).

Everything here is selection + frozen-feature aggregation — the reference
freezes the feature table (``model_handler.py:86``) and gradients reach
``label_clf`` only through the similarity loss (``src/model.py:54-61``) —
so all inputs are stop-gradiented and the dynamic-trip-count loops
(``lax.while_loop`` / traced-bound ``fori_loop``) never need a transpose.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcgnn_tpu.graph.csr import RelGraph
from pcgnn_tpu.ops.aggregate import _INF, keep_nearest

# chunk: hub rows processed per while-loop iteration.  Each chunk sweeps
# ceil(max_deg_in_chunk / block) blocks for ALL its rows, so per-chunk
# work is chunk x max_deg — small chunks + degree-descending row order
# (see _run_hub_chunks) keep it near sum(deg) instead of
# n_hub x global_dmax (measured 9x on yelp-skew: a batch mixes deg-16k
# hubs with deg-200 ones).
# block: CSR edge-tail slots swept per inner iteration (multiple of 128).
HUB_CHUNK = 32
HUB_BLOCK = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _keep_widths(dh: int, block: int) -> list:
    """Static sort widths for :func:`keep_nearest_switch`: powers of 4
    from one block up to the padded max degree."""
    ws, w = [], block
    while w < dh:
        ws.append(w)
        w *= 4
    ws.append(dh)
    return ws


def keep_nearest_switch(dist, kf_rows, jb, block: int):
    """``keep_nearest`` over only the first ``jb * block`` columns of the
    chunk's distance buffer, via ``lax.switch`` over a few static widths.

    The buffer is statically [chunk, dh] with dh = roundup(dmax) — on
    skewed graphs 16k+ wide — but a chunk's rows only populate
    ``jb * block`` slots (degree-descending ordering keeps jb near the
    chunk's own max degree, ``_run_hub_chunks``).  Sorting the full width
    for every chunk made the value sort the dominant skew-step cost;
    truncating to the smallest covering width is exact: slots beyond
    ``jb * block`` are +inf (never kept) and ``keff <= deg <= jb * block``
    so every rank decision happens inside the truncation.
    """
    dh = dist.shape[1]
    widths = _keep_widths(dh, block)

    def branch(w):
        def f(dist, kf_rows):
            dw = dist[:, :w]
            keep_w = keep_nearest(dw, kf_rows, jnp.isfinite(dw))
            if w == dh:
                return keep_w
            return jnp.pad(keep_w, ((0, 0), (0, dh - w)))
        return f

    if len(widths) == 1:
        return branch(dh)(dist, kf_rows)
    bounds = jnp.asarray([w // block for w in widths[:-1]], jnp.int32)
    idx = jnp.searchsorted(bounds, jb, side="left")
    return jax.lax.switch(idx, [branch(w) for w in widths], dist, kf_rows)


def _window_block(col: jax.Array, starts: jax.Array, j: jax.Array,
                  block: int) -> jax.Array:
    """[H, block] neighbor ids from each row's edge-list tail at offset
    j·block of a flat ``col`` array (a relation CSR, or the sharded hub
    edge store ``parallel.spmd``).

    Rows are contiguous runs, so the Pallas ragged gather turns this into
    per-row DMAs; the edge array must be padded past any
    start + roundup1024(block) + 1024 (``graph.csr._finalize`` guarantees
    it for relation CSRs).
    """
    starts_j = starts + j * block
    from pcgnn_tpu.ops.pallas import ragged_gather
    if ragged_gather.available():
        return ragged_gather.ragged_window_gather(col, starts_j, block)
    offs = jax.lax.broadcasted_iota(jnp.int32, (starts.shape[0], block), 1)
    pos = jnp.clip(starts_j[:, None] + offs, 0, col.shape[0] - 1)
    return col[pos]


def _run_hub_chunks(is_hub: jax.Array, chunk: int, f: int, dtype,
                    chunk_fn, deg=None):
    """Compact hub rows to the front, run ``chunk_fn`` per chunk of
    ``chunk`` rows (dynamic trip count = ceil(n_hub/chunk)), and
    un-permute the per-row (num, cnt) results back to batch order.

    ``chunk_fn(rows_slot [chunk], active [chunk]) -> (num, cnt)`` where
    ``rows_slot`` are *batch positions*.  Non-hub rows return zeros.

    ``deg`` ([B], optional): order hub rows by DESCENDING degree so each
    chunk's rows have similar tail lengths — a chunk sweeps
    ceil(max_deg/block) blocks for all its rows, so mixing a deg-16k hub
    with deg-200 ones multiplies the swept slots ~max/mean-fold.
    """
    b = is_hub.shape[0]
    if deg is not None:
        # hubs first, heaviest first; non-hubs keyed far above any degree
        key = jnp.where(is_hub, -deg.astype(jnp.int64), jnp.int64(1) << 60)
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
    else:
        order = jnp.argsort(~is_hub, stable=True).astype(jnp.int32)
    n_h = jnp.sum(is_hub.astype(jnp.int32))
    bp = _round_up(b, chunk)
    order_p = jnp.pad(order, (0, bp - b))
    state0 = (jnp.int32(0), jnp.zeros((bp, f), dtype), jnp.zeros((bp,), dtype))

    def body(state):
        c, num_buf, cnt_buf = state
        rows_slot = jax.lax.dynamic_slice(order_p, (c * chunk,), (chunk,))
        active = (c * chunk + jnp.arange(chunk, dtype=jnp.int32)) < n_h
        num_c, cnt_c = chunk_fn(rows_slot, active)
        num_c = jnp.where(active[:, None], num_c, 0.0)
        cnt_c = jnp.where(active, cnt_c, 0.0)
        num_buf = jax.lax.dynamic_update_slice(num_buf, num_c, (c * chunk, 0))
        cnt_buf = jax.lax.dynamic_update_slice(cnt_buf, cnt_c, (c * chunk,))
        return c + 1, num_buf, cnt_buf

    _, num_buf, cnt_buf = jax.lax.while_loop(
        lambda s: s[0] * chunk < n_h, body, state0)
    inv = jnp.argsort(order).astype(jnp.int32)   # position of row b in order
    return num_buf[inv], cnt_buf[inv]


def chunk_minor_band(c_s0, ks_rows, fraud, active, sp_sorted, slot_sorted,
                     feats_sorted, rho: float):
    """Exact oversampled-minor selection + feature sum for one hub chunk.

    The reference appends, for each fraud center, the ``int(ksample·rho)``
    training positives nearest in label-aware score, stable-sorted with
    ties resolved by candidate position (``src/layers.py:675-691``).  For
    hub rows ``m`` can reach the whole candidate pool, so the per-row
    compact window (``ops.aggregate.oversample_candidates``) would be
    O(B·P); instead the few hub rows (compacted to chunks of
    ``HUB_CHUNK``) select over the score-SORTED candidate axis directly:

      d      = |c_s0 - sp_sorted|            ([H, P], shared table — no
                                              per-row feature gathers)
      t      = m-th smallest distance        (one [H, P] value sort)
      sel    = (d < t)  |  first (m - #strict) ties in SLOT order
                                              (double argsort of the tied
                                              slots — the oracle tie rule)
      num    = sel @ feats_sorted            (one [H, P]x[P, F] MXU matmul)

    Exactly the dense-oracle selection (``oversample_candidates_dense``),
    bit-identical tie handling, at O(H·P) for H = chunk hub rows instead
    of O(B·P).

    Returns (mnum [H, F], mcnt [H], t [H]); ``t`` doubles as the pass-2
    duplicate-subtraction threshold (+inf when every valid candidate is
    selected, -inf on inactive rows — ``minor_dedup_threshold`` semantics).
    """
    p = sp_sorted.shape[0]
    m = jnp.floor(ks_rows.astype(jnp.float32) * rho).astype(jnp.int32)
    act = active & fraud & (m > 0)
    d = jnp.abs(c_s0[:, None] - sp_sorted[None, :])       # [H, P]; pad=+inf
    ds = jax.lax.sort(d)                                  # ascending per row
    n_valid = jnp.sum(jnp.isfinite(sp_sorted).astype(jnp.int32))
    idx = jnp.clip(m - 1, 0, p - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, ds.shape, 1)
    at_m = jnp.sum(jnp.where(cols == idx[:, None], ds, 0.0), axis=1)
    t = jnp.where(m >= n_valid, _INF, at_m)
    t = jnp.where(act, t, -_INF)
    strict = d < t[:, None]
    tied = d == t[:, None]
    m_eff = jnp.clip(m, 0, n_valid)
    n_needed = m_eff - jnp.sum(strict.astype(jnp.int32), axis=1)
    key = jnp.where(tied, slot_sorted[None, :], jnp.int32(2 ** 31 - 1))
    order = jnp.argsort(key, axis=1, stable=True)
    rank = jnp.argsort(order, axis=1, stable=True)
    sel = (strict | (tied & (rank < n_needed[:, None]))) & act[:, None]
    w = sel.astype(feats_sorted.dtype)
    # precision='highest': the 0/1 mask is bf16-exact but the candidate
    # FEATURES are not — default TPU matmul precision would round every
    # selected feature through bf16 (~0.4% per element), while the window
    # lane sums the same rows at full f32
    mnum = jnp.dot(w, feats_sorted, precision="highest",
                   preferred_element_type=jnp.float32)
    mcnt = jnp.where(act, m_eff, 0).astype(feats_sorted.dtype)
    return mnum, mcnt, t


def hub_choose_sum(
    rel: RelGraph,
    batch: jax.Array,
    is_hub: jax.Array,
    xs: jax.Array,
    f: int,
    center_s0: jax.Array,
    *,
    s0_col: Optional[int] = None,
    w0: Optional[jax.Array] = None,
    b0: Optional[jax.Array] = None,
    round_sel: bool = False,
    tp_col: Optional[int] = None,
    minor_ctx: Optional[tuple] = None,
    batch_labels: Optional[jax.Array] = None,
    rho: float = 0.5,
    chunk: int = HUB_CHUNK,
    block: int = HUB_BLOCK,
):
    """Choose + sum over hub rows' full neighbor lists, blockwise.

    Args:
      rel: capped relation (``rel.has_hubs``).
      batch: [B] node ids.
      is_hub: [B] bool, deg[batch] > rel.window_width.
      xs: [N+1, FC] padded feature table (+score/train-pos columns).
      f: number of leading feature columns to aggregate.
      center_s0: [B] label-aware score channel 0 of the centers.
      s0_col: column of ``xs`` holding each node's score (table path);
        None computes it as ``xs[..., :f] @ w0 + b0`` (window path) — the
        same contraction the window lane uses, so distances match exactly.
      round_sel: round feature rows through bfloat16 before the score
        contraction (packed-store graphs: the window lane ranks bf16-rounded
        values, so hub rows of the same relation must too —
        ``models.pcgnn`` sel_round).  Aggregation values stay exact.
      tp_col: column of ``xs`` holding the valid-train-positive indicator
        (train only); enables duplicate-minor subtraction against the
        in-chunk band threshold.
      minor_ctx: (sp_sorted [P], slot_sorted [P], feats_sorted [P, F]) —
        the score-sorted candidate table (train only).  Hub rows' minors
        are selected + summed in-chunk (``chunk_minor_band``) and folded
        into the returned sums; the caller must therefore EXCLUDE hub rows
        from the window lane's keep-minor mask.
      batch_labels: [B] int labels (train only; fraud gating of minors).
      chunk/block: memory-shape knobs (see module docstring).

    Returns (num [B, f], cnt [B]); zeros at non-hub rows.
    """
    sg = jax.lax.stop_gradient
    xs = sg(xs)
    center_s0 = sg(center_s0)
    w0 = sg(w0) if w0 is not None else None
    b0 = sg(b0) if b0 is not None else None
    if minor_ctx is not None:
        minor_ctx = tuple(sg(a) for a in minor_ctx)
    dh = _round_up(max(rel.dmax, 1), block)

    def chunk_fn(rows_slot, active):
        rows = batch[rows_slot]
        start = rel.indptr[rows]
        deg = jnp.where(active, rel.deg[rows], 0)
        kf_rows = rel.keff[rows]
        c_s0 = center_s0[rows_slot]
        thr = None
        mnum = mcnt = None
        if minor_ctx is not None:
            mnum, mcnt, thr = chunk_minor_band(
                c_s0, rel.ksample[rows], batch_labels[rows_slot] == 1,
                active, *minor_ctx, rho)
        jb = (jnp.max(deg) + block - 1) // block     # dynamic trip count

        def pass1(j, dist):
            nbr = _window_block(rel.col, start, j, block)
            offs = j * block + jnp.arange(block, dtype=jnp.int32)[None, :]
            v = offs < deg[:, None]
            xw = xs[nbr]
            if s0_col is not None:
                s0n = xw[..., s0_col]
            else:
                rows_f = xw[..., :f]
                if round_sel:
                    rows_f = rows_f.astype(jnp.bfloat16).astype(jnp.float32)
                s0n = jnp.dot(rows_f, w0, precision="highest",
                              preferred_element_type=jnp.float32) + b0
            d = jnp.where(v, jnp.abs(c_s0[:, None] - s0n), _INF)
            return jax.lax.dynamic_update_slice(dist, d, (0, j * block))

        dist = jax.lax.fori_loop(
            0, jb, pass1, jnp.full((chunk, dh), _INF, jnp.float32))
        keep = keep_nearest_switch(dist, kf_rows, jb, block)

        def pass2(j, acc):
            num, cnt = acc
            nbr = _window_block(rel.col, start, j, block)
            xw = xs[nbr]
            kb = jax.lax.dynamic_slice(keep, (0, j * block), (chunk, block))
            w = kb.astype(xs.dtype)
            if tp_col is not None and thr is not None:
                db = jax.lax.dynamic_slice(dist, (0, j * block),
                                           (chunk, block))
                dup = kb & (xw[..., tp_col] > 0.5) & (db <= thr[:, None])
                w = w - dup.astype(xs.dtype)
            num = num + jnp.einsum("hw,hwf->hf", w, xw[..., :f])
            return num, cnt + jnp.sum(w, axis=1)

        num, cnt = jax.lax.fori_loop(
            0, jb, pass2, (jnp.zeros((chunk, f), xs.dtype),
                           jnp.zeros((chunk,), xs.dtype)))
        if mnum is not None:
            num, cnt = num + mnum, cnt + mcnt
        return num, cnt

    return _run_hub_chunks(is_hub, chunk, f, xs.dtype, chunk_fn,
                           deg=jax.lax.stop_gradient(rel.deg[batch]))


def hub_mean_sum(
    rel: RelGraph,
    batch: jax.Array,
    is_hub: jax.Array,
    x_padded: jax.Array,
    *,
    include_self: bool = True,
    chunk: int = HUB_CHUNK,
    block: int = HUB_BLOCK,
):
    """All-neighbor sum over hub rows, blockwise — the no-choose lane for
    the GraphSAGE/GCN baselines (``src/graphsage.py:78-96,210-226``).

    ``include_self`` reproduces ``union_self_window``'s conditional self
    union: the self feature joins only when the row's CSR lacks the
    self-loop.  Returns (num [B, F], cnt [B]); zeros at non-hub rows.
    """
    x_padded = jax.lax.stop_gradient(x_padded)
    f = x_padded.shape[1]

    def chunk_fn(rows_slot, active):
        rows = batch[rows_slot]
        start = rel.indptr[rows]
        deg = jnp.where(active, rel.deg[rows], 0)
        jb = (jnp.max(deg) + block - 1) // block

        def body(j, acc):
            num, cnt, has_self = acc
            nbr = _window_block(rel.col, start, j, block)
            offs = j * block + jnp.arange(block, dtype=jnp.int32)[None, :]
            v = offs < deg[:, None]
            w = v.astype(x_padded.dtype)
            num = num + jnp.einsum("hw,hwf->hf", w, x_padded[nbr])
            has_self = has_self | jnp.any(v & (nbr == rows[:, None]), axis=1)
            return num, cnt + jnp.sum(w, axis=1), has_self

        num, cnt, has_self = jax.lax.fori_loop(
            0, jb, body, (jnp.zeros((chunk, f), x_padded.dtype),
                          jnp.zeros((chunk,), x_padded.dtype),
                          jnp.zeros((chunk,), bool)))
        if include_self:
            miss = (~has_self).astype(x_padded.dtype)
            num = num + miss[:, None] * x_padded[rows]
            cnt = cnt + miss
        return num, cnt

    return _run_hub_chunks(is_hub, chunk, f, x_padded.dtype, chunk_fn,
                           deg=jax.lax.stop_gradient(rel.deg[batch]))
