import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
from pcgnn_tpu.graph.csr import csr_from_edges
from pcgnn_tpu.ops.aggregate import (
    batch_neighbor_window,
    choose_keep_mask,
    masked_mean_aggregate,
    row_ranks,
    scatter_batch_mask,
    segment_mean_spmm,
)
from pcgnn_tpu.ops.sddmm import edge_abs_diff, edge_ranks_global


def _tiny_graph():
    return synthetic_fraud_graph("tiny", seed=1)


def test_batch_neighbor_window_matches_csr():
    g = _tiny_graph()
    rel = g.relations[0]
    indptr, col = np.asarray(rel.indptr), np.asarray(rel.col)
    batch = jnp.asarray([0, 5, 17, 5], jnp.int32)  # includes a duplicate
    nbr, valid = jax.jit(batch_neighbor_window, static_argnums=())(rel, batch)
    nbr, valid = np.asarray(nbr), np.asarray(valid)
    for i, v in enumerate([0, 5, 17, 5]):
        expect = col[indptr[v]:indptr[v + 1]].tolist()
        got = nbr[i][valid[i]].tolist()
        assert got == expect
        assert (nbr[i][~valid[i]] == rel.num_nodes).all()


def test_row_ranks_exact():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(16, 33)).astype(np.float32)
    r = np.asarray(row_ranks(jnp.asarray(d)))
    for i in range(16):
        order = np.argsort(d[i], kind="stable")
        expect = np.empty(33, dtype=int)
        expect[order] = np.arange(33)
        assert np.array_equal(r[i], expect)


def test_row_ranks_tie_break_by_index():
    d = jnp.asarray([[1.0, 0.5, 0.5, 0.0]])
    r = np.asarray(row_ranks(d))[0]
    assert r.tolist() == [3, 1, 2, 0]


def test_scatter_mask_set_semantics():
    nbr = jnp.asarray([[1, 2, 2, 5], [0, 5, 5, 5]], jnp.int32)
    keep = jnp.asarray([[True, True, True, False], [True, False, False, False]])
    mask = np.asarray(scatter_batch_mask(5, nbr, keep))
    # column 5 is the padding sentinel and is sliced off
    assert mask.shape == (2, 5)
    assert mask[0].tolist() == [0, 1, 1, 0, 0]  # duplicate 2 clamps to 1
    assert mask[1].tolist() == [1, 0, 0, 0, 0]


def test_masked_mean_aggregate_matches_dense():
    rng = np.random.default_rng(1)
    mask = (rng.random((8, 20)) < 0.3).astype(np.float32)
    x = rng.normal(size=(20, 7)).astype(np.float32)
    got = np.asarray(masked_mean_aggregate(jnp.asarray(mask), jnp.asarray(x)))
    cnt = np.maximum(mask.sum(1, keepdims=True), 1.0)
    np.testing.assert_allclose(got, (mask / cnt) @ x, rtol=1e-5)
    got_s = np.asarray(masked_mean_aggregate(jnp.asarray(mask), jnp.asarray(x),
                                             norm="sqrt"))
    np.testing.assert_allclose(got_s, (mask / np.sqrt(cnt)) @ x, rtol=1e-5)


def test_segment_mean_spmm_matches_dense():
    g = _tiny_graph()
    rel = g.relations[1]
    x = np.asarray(g.features)
    out = np.asarray(segment_mean_spmm(rel, g.features))
    indptr, col = np.asarray(rel.indptr), np.asarray(rel.col)
    for v in [0, 3, 100, 511]:
        neigh = col[indptr[v]:indptr[v + 1]]
        np.testing.assert_allclose(out[v], x[neigh].mean(0), rtol=1e-5)


def test_edge_abs_diff_and_global_ranks():
    rel = csr_from_edges([0, 0, 1], [1, 2, 2], 4)
    s0 = jnp.asarray([0.0, 1.0, 3.0, -2.0])
    d = np.asarray(edge_abs_diff(rel, s0))
    indptr = np.asarray(rel.indptr)
    col = np.asarray(rel.col)
    s = np.asarray(s0)
    for v in range(4):
        for e in range(indptr[v], indptr[v + 1]):
            assert d[e] == abs(s[v] - s[col[e]])
    assert np.isinf(d[rel.num_edges:]).all()

    ranks = np.asarray(edge_ranks_global(rel, jnp.asarray(d)))
    for v in range(4):
        span = slice(indptr[v], indptr[v + 1])
        expect = np.empty(indptr[v + 1] - indptr[v], dtype=int)
        order = np.argsort(d[span], kind="stable")
        expect[order] = np.arange(len(expect))
        assert np.array_equal(ranks[span], expect)


def test_window_aggregate_matches_scatter_path():
    """The scatter-free gather path must equal the dense-mask GEMM path,
    including minor oversampling with set-dedup."""
    from pcgnn_tpu.ops.aggregate import dedup_minor_keep, window_mean_aggregate

    rng = np.random.default_rng(3)
    n, b, d, p, f = 30, 6, 5, 8, 4
    nbr = jnp.asarray(rng.integers(0, n, (b, d)), jnp.int32)
    keep = jnp.asarray(rng.random((b, d)) < 0.6)
    minor_ids = jnp.asarray(rng.choice(n, p, replace=False), jnp.int32)
    keep_minor = jnp.asarray(rng.random((b, p)) < 0.5)
    x = rng.normal(size=(n, f)).astype(np.float32)
    x_padded = jnp.asarray(np.vstack([x, np.zeros((1, f), np.float32)]))

    mask = scatter_batch_mask(n, nbr, keep, minor_ids, keep_minor)
    want = np.asarray(masked_mean_aggregate(mask, jnp.asarray(x)))

    cand_ids = jnp.broadcast_to(minor_ids[None, :], (b, p))
    km = dedup_minor_keep(nbr, keep, n, cand_ids, keep_minor)
    got = np.asarray(window_mean_aggregate(nbr, keep, x_padded, cand_ids, km))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_union_self_window_no_double_count():
    from pcgnn_tpu.ops.aggregate import union_self_window

    nbr = jnp.asarray([[0, 1, 9], [2, 3, 9]], jnp.int32)  # 9 = sentinel
    valid = jnp.asarray([[True, True, False], [True, True, False]])
    batch = jnp.asarray([0, 7], jnp.int32)  # 0 already own neighbor; 7 not
    nbr2, keep2 = union_self_window(nbr, valid, batch)
    assert not bool(keep2[0, -1])  # node 0: self already present
    assert bool(keep2[1, -1]) and int(nbr2[1, -1]) == 7


def test_choose_keep_mask_counts():
    g = _tiny_graph()
    rel = g.relations[0]
    rng = np.random.default_rng(2)
    s0 = jnp.asarray(
        np.concatenate([rng.normal(size=g.num_nodes), [0.0]]).astype(np.float32))
    batch = jnp.asarray(rng.integers(0, g.num_nodes, 32), jnp.int32)
    nbr, valid = batch_neighbor_window(rel, batch)
    keep = np.asarray(choose_keep_mask(rel, batch, nbr, valid, s0))
    keff = np.asarray(rel.keff)[np.asarray(batch)]
    assert np.array_equal(keep.sum(1), keff)


def test_dense_neighbor_table_matches_csr_gather():
    # the [N, dmax] dense table path must agree exactly with the CSR gather
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
    from pcgnn_tpu.ops.aggregate import batch_neighbor_window

    g = synthetic_fraud_graph("tiny", seed=0)
    rng = np.random.default_rng(0)
    for rel in (*g.relations, g.homo):
        assert rel.nbr2d is not None  # tiny graphs are under the HBM budget
        batch = jnp.asarray(rng.integers(0, rel.num_nodes, 77), jnp.int32)
        nbr_d, val_d = batch_neighbor_window(rel, batch)
        rel_csr = dataclasses.replace(rel, nbr2d=None)
        nbr_c, val_c = batch_neighbor_window(rel_csr, batch)
        np.testing.assert_array_equal(np.asarray(nbr_d), np.asarray(nbr_c))
        np.testing.assert_array_equal(np.asarray(val_d), np.asarray(val_c))


def test_dense_neighbor_table_budget_gate(monkeypatch):
    import numpy as np
    from pcgnn_tpu.graph import csr as csr_mod

    monkeypatch.setattr(csr_mod, "NBR2D_BUDGET_BYTES", 8)  # force over budget
    rng = np.random.default_rng(0)
    rel = csr_mod.csr_from_edges(rng.integers(0, 50, 200),
                                 rng.integers(0, 50, 200), 50)
    assert rel.nbr2d is None  # falls back to CSR-only


@pytest.mark.slow
def test_oversample_candidates_windowed_matches_dense_oracle():
    """The production 1-D windowed selection (sort + searchsorted + [B,2M]
    lexicographic sort) must reproduce the dense [B,P] top_k oracle:
    exactly (ids + slot tie-breaking) for continuous scores, and as an
    identical selected-distance multiset when scores carry exact f32 ties
    (the tie-robust parity target, SURVEY.md §7 — a tied run cut by the
    window may legitimately resolve tied slots in a different order)."""
    from pcgnn_tpu.ops.aggregate import (
        oversample_candidates,
        oversample_candidates_dense,
    )

    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(50, 400))
        p = int(rng.integers(5, 100))
        b = int(rng.integers(1, 48))
        m = int(rng.integers(1, 50))
        s0 = rng.normal(size=n + 1).astype(np.float32)
        tied = trial % 3 == 0
        if tied:
            s0 = np.round(s0, 1)  # force score ties
        tp = rng.integers(0, n, size=p).astype(np.int32)
        tpv = rng.random(p) > (0.2 if trial % 2 else 0.0)
        if not tpv.any():
            tpv[0] = True
        batch = rng.integers(0, n, size=b).astype(np.int32)
        args = (jnp.asarray(batch), jnp.asarray(s0), jnp.asarray(tp),
                jnp.asarray(tpv), m)
        a_ids, a_val, a_d, a_sl = oversample_candidates(*args)
        d_ids, d_val, d_d, d_sl = oversample_candidates_dense(*args)
        # slots address train_pos: ids must equal train_pos[slots] at
        # valid positions (the compact minor-gather contract)
        for ids, val, sl in ((a_ids, a_val, a_sl), (d_ids, d_val, d_sl)):
            ids, val, sl = map(np.asarray, (ids, val, sl))
            assert (np.where(val, tp[sl], -1) == np.where(val, ids, -1)).all()
        a_ids, a_val = np.asarray(a_ids), np.asarray(a_val)
        d_ids, d_val = np.asarray(d_ids), np.asarray(d_val)
        # returned distances must match the recomputed |s0_c - s0_p| at the
        # selected slots (both code paths)
        for ids, val, dd in ((a_ids, a_val, np.asarray(a_d)),
                             (d_ids, d_val, np.asarray(d_d))):
            want = np.abs(s0[batch][:, None] - s0[ids])
            assert np.allclose(np.where(val, dd, 0), np.where(val, want, 0))
        assert a_ids.shape == (b, m)
        assert (a_val == d_val).all()
        if tied:
            da = np.where(a_val, np.abs(s0[batch][:, None] - s0[a_ids]), -1)
            dd = np.where(d_val, np.abs(s0[batch][:, None] - s0[d_ids]), -1)
            assert (np.sort(da, axis=1) == np.sort(dd, axis=1)).all()
        else:
            assert (np.where(a_val, a_ids, -1)
                    == np.where(d_val, d_ids, -1)).all()


@pytest.mark.slow
def test_keep_nearest_matches_rank_rule():
    """keep_nearest (value sort + threshold + tie prefix) must equal the
    double-argsort rank rule valid & (row_ranks(d) < k) bit-for-bit,
    including tied values, k=0, k>num_valid, and all-invalid rows."""
    from pcgnn_tpu.ops.aggregate import keep_nearest

    rng = np.random.default_rng(13)
    for trial in range(20):
        b = int(rng.integers(1, 40))
        dcols = int(rng.integers(1, 60))
        d = rng.normal(size=(b, dcols)).astype(np.float32)
        if trial % 2:
            d = np.round(d, 1)  # force ties
        valid = rng.random((b, dcols)) > 0.3
        if trial % 5 == 0:
            valid[0, :] = False
        k = rng.integers(0, dcols + 2, size=b).astype(np.int32)
        dj = jnp.where(jnp.asarray(valid), jnp.asarray(d), jnp.inf)
        got = np.asarray(keep_nearest(dj, jnp.asarray(k), jnp.asarray(valid)))
        want = np.asarray(
            jnp.asarray(valid) & (row_ranks(dj) < jnp.asarray(k)[:, None]))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_ragged_window_gather_interpret_matches_numpy():
    """Pallas ragged contiguous-run gather (interpret mode on CPU) must
    reproduce per-row numpy slices, including ragged B and repeated rows."""
    from pcgnn_tpu.ops.pallas.ragged_gather import ragged_window_gather

    rng = np.random.default_rng(5)
    e = 8192
    col = jnp.asarray(rng.integers(0, 999, e), jnp.int32)
    # bound from the kernel doc: E >= align1024(max start) + 2048
    starts = jnp.asarray(
        np.concatenate([rng.integers(0, e - 3 * 1024, 21), [0, 0]]), jnp.int32)
    out = np.asarray(ragged_window_gather(col, starts, 128, interpret=True))
    want = np.stack([np.asarray(col)[s:s + 128] for s in np.asarray(starts)])
    np.testing.assert_array_equal(out, want)


def test_csr_fallback_gather_unaffected_by_edge_padding():
    """The build-time window padding of the edge array must not change the
    CSR fallback gather results (padding entries are sentinels)."""
    import dataclasses

    g = _tiny_graph()
    rng = np.random.default_rng(1)
    for rel in g.relations:
        rel_csr = dataclasses.replace(rel, nbr2d=None)
        batch = jnp.asarray(rng.integers(0, rel.num_nodes, 33), jnp.int32)
        nbr_c, val_c = batch_neighbor_window(rel_csr, batch)
        nbr_d, val_d = batch_neighbor_window(rel, batch)
        np.testing.assert_array_equal(np.asarray(nbr_c), np.asarray(nbr_d))
        np.testing.assert_array_equal(np.asarray(val_c), np.asarray(val_d))


def test_spmm_window_form_matches_segment_form():
    """The nbr2d window lowering of segment_mean_spmm must equal the
    flat-edge segment_sum lowering (same math, different schedule)."""
    from pcgnn_tpu.ops import aggregate as agg

    g = _tiny_graph()
    for rel in g.relations:
        if rel.nbr2d is None or rel.has_hubs:
            continue
        feats_pad = jnp.concatenate(
            [g.features, jnp.zeros((1, g.feat_dim), g.features.dtype)])
        win = np.asarray(agg._window_mean_all_nodes(rel, feats_pad)
                         [: rel.num_nodes])
        # force the segment path by passing an all-true keep filter
        keep = jnp.ones((rel.col.shape[0],), bool)
        seg = np.asarray(agg.segment_mean_spmm(rel, g.features, keep=keep))
        np.testing.assert_allclose(win, seg, rtol=2e-5, atol=1e-6)


def test_spmm_window_form_chunk_tail():
    """Node counts that do not divide SPMM_NODE_CHUNK exercise the clamped
    tail block."""
    from pcgnn_tpu.ops import aggregate as agg

    old = agg.SPMM_NODE_CHUNK
    agg.SPMM_NODE_CHUNK = 100  # 512 nodes -> 6 blocks, ragged tail
    try:
        g = _tiny_graph()
        rel = g.relations[0]
        out = np.asarray(segment_mean_spmm(rel, g.features))
        indptr, col = np.asarray(rel.indptr), np.asarray(rel.col)
        x = np.asarray(g.features)
        for v in [0, 99, 100, 499, 511]:
            neigh = col[indptr[v]:indptr[v + 1]]
            if len(neigh):
                np.testing.assert_allclose(out[v], x[neigh].mean(0),
                                           rtol=1e-5)
    finally:
        agg.SPMM_NODE_CHUNK = old


def test_edge_abs_diff_window_matches_flat():
    """Window-layout SDDMM slot (v, j) must equal the flat form at edge
    position indptr[v] + j, including the ragged chunk tail."""
    from pcgnn_tpu.ops import sddmm

    old = sddmm.SDDMM_NODE_CHUNK
    sddmm.SDDMM_NODE_CHUNK = 100  # 512 nodes -> ragged tail block
    try:
        g = _tiny_graph()
        rel = g.relations[1]
        s0 = jnp.asarray(
            np.random.default_rng(0).standard_normal(rel.num_nodes),
            jnp.float32)
        dist_w, valid_w = sddmm.edge_abs_diff_window(rel, s0)
        flat = np.asarray(sddmm.edge_abs_diff(rel, s0))
        dist_w, valid_w = np.asarray(dist_w), np.asarray(valid_w)
        indptr = np.asarray(rel.indptr)
        deg = np.asarray(rel.deg)
        for v in [0, 7, 99, 100, 500, 511]:
            k = deg[v]
            assert valid_w[v, :k].all() and not valid_w[v, k:].any()
            np.testing.assert_allclose(dist_w[v, :k],
                                       flat[indptr[v]:indptr[v] + k],
                                       rtol=1e-6)
            assert np.isinf(dist_w[v, k:]).all()
    finally:
        sddmm.SDDMM_NODE_CHUNK = old
