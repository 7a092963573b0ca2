import numpy as np
import pytest
import scipy.sparse as sp

from pcgnn_tpu.graph.csr import (
    csr_from_adj_dict,
    csr_from_edges,
    csr_from_scipy,
)


def test_csr_from_edges_self_loops_symmetric():
    # 0-1, 1-2 directed input; expect symmetric closure + self-loops
    rel = csr_from_edges([0, 1], [1, 2], 4)
    indptr = np.asarray(rel.indptr)
    col = np.asarray(rel.col)
    adj = {v: set(col[indptr[v]:indptr[v + 1]].tolist()) for v in range(4)}
    assert adj == {0: {0, 1}, 1: {0, 1, 2}, 2: {1, 2}, 3: {3}}
    assert np.array_equal(np.asarray(rel.deg), [2, 3, 2, 1])


def test_csr_dedupes_parallel_edges():
    rel = csr_from_edges([0, 0, 0], [1, 1, 1], 2)
    assert rel.num_edges == 4  # {0-0, 0-1, 1-0, 1-1}


def test_keff_rule():
    # reference: k = ceil(0.5*deg); keep all if deg <= k+1
    # deg=1 -> k=1, keep 1; deg=2 -> k=1, 2<=2 keep 2; deg=3 -> k=2, 3<=3 keep 3
    # deg=4 -> k=2, 4>3 keep 2; deg=5 -> k=3, 5<=4? no, keep 3; deg=7 -> k=4, keep 4
    degs = np.array([1, 2, 3, 4, 5, 7])
    k = np.ceil(0.5 * degs).astype(int)
    expected_keff = np.where(degs <= k + 1, degs, k)
    # build a star-free graph with exact degrees: node i has degs[i] neighbors
    src, dst = [], []
    base = len(degs)
    nxt = base
    for i, d in enumerate(degs):
        for _ in range(d - 1):  # -1: self loop will be added
            src.append(i)
            dst.append(nxt)
            nxt += 1
    rel = csr_from_edges(src, dst, nxt, symmetrize=False, add_self_loops=True)
    # symmetrize=False keeps only i->leaf edges + self loops for rows 0..5
    got_deg = np.asarray(rel.deg)[:base]
    assert np.array_equal(got_deg, degs)
    assert np.array_equal(np.asarray(rel.keff)[:base], expected_keff)
    assert np.array_equal(np.asarray(rel.ksample)[:base], k)


def test_csr_from_scipy_matches_edges():
    rng = np.random.default_rng(0)
    n = 50
    m = sp.random(n, n, density=0.1, random_state=0, format="csr")
    rel = csr_from_scipy(m)
    dense = (m.toarray() != 0)
    dense = dense | dense.T | np.eye(n, dtype=bool)
    indptr, col = np.asarray(rel.indptr), np.asarray(rel.col)
    for v in rng.integers(0, n, 10):
        assert set(col[indptr[v]:indptr[v + 1]].tolist()) == set(
            np.flatnonzero(dense[v]).tolist())


def test_csr_from_adj_dict():
    adj = {0: {0, 1}, 1: {0, 1}, 2: {2}}
    rel = csr_from_adj_dict(adj, 3)
    assert rel.num_edges == 5
    assert np.array_equal(np.asarray(rel.deg), [2, 2, 1])
    assert rel.dmax == 2


def test_padding_sentinels():
    rel = csr_from_edges([0], [1], 3)
    col = np.asarray(rel.col)
    assert (col[rel.num_edges:] == 3).all()
    assert rel.e_pad % 128 == 0


def test_edge_pad_multiple_keeps_1024_divisibility():
    # a non-1024-divisible pad multiple must not break the ragged-gather
    # invariant (ADVICE r1: lcm rounding in _finalize)
    rel = csr_from_edges([0, 1, 2], [1, 2, 3], 8, edge_pad_multiple=1536)
    assert rel.e_pad % 1024 == 0
    assert rel.e_pad % 1536 == 0


def test_degree_stub_rejected_by_window_consumers():
    import jax.numpy as jnp

    from pcgnn_tpu.graph.csr import degree_stub
    from pcgnn_tpu.ops.aggregate import batch_neighbor_window, segment_mean_spmm

    stub = degree_stub(np.array([3, 2, 5]))
    assert stub.is_stub
    with pytest.raises(ValueError, match="stub"):
        batch_neighbor_window(stub, jnp.array([0, 1], jnp.int32))
    with pytest.raises(ValueError, match="stub"):
        segment_mean_spmm(stub, jnp.zeros((3, 4), jnp.float32))


def test_save_native_rejects_stub(tmp_path):
    import jax.numpy as jnp

    from pcgnn_tpu.data.loaders import save_native
    from pcgnn_tpu.graph.csr import build_multirel, degree_stub

    rel = csr_from_edges([0, 1], [1, 2], 3)
    stub = degree_stub(np.array([2, 2, 2]))
    g = build_multirel([rel], stub, np.zeros((3, 4), np.float32),
                       np.zeros(3, np.int64))
    with pytest.raises(ValueError, match="stub"):
        save_native(str(tmp_path / "g.npz"), g)


def test_directed_stub_homo_degrees_deduped():
    # stress presets derive stub-homo degrees with the same set semantics a
    # real homo CSR would apply (ADVICE r1): duplicates and self edges
    # collapse
    from pcgnn_tpu.data import synthetic

    synthetic.PRESETS["_test-directed"] = (64, 8, 0.2, (256, 128), 2)
    synthetic._DIRECTED_PRESETS.add("_test-directed")
    try:
        g = synthetic.synthetic_fraud_graph("_test-directed", seed=3)
        # rebuild the exact homo CSR from the same edge draws
        rng = np.random.default_rng(3)
        labels = (rng.random(64) < 0.2).astype(np.int64)
        direction = rng.normal(size=(8,))
        rng.normal(size=(64, 8))
        pos = np.flatnonzero(labels == 1)
        neg = np.flatnonzero(labels == 0)
        keys = [np.arange(64) * 64 + np.arange(64)]
        for e_count in (256, 128):
            src = rng.integers(0, 64, size=e_count)
            homo_edge = rng.random(e_count) < 0.5
            dst_uniform = rng.integers(0, 64, size=e_count)
            dst_same = np.where(
                labels[src] == 1,
                pos[rng.integers(0, len(pos), size=e_count)],
                neg[rng.integers(0, len(neg), size=e_count)])
            dst = np.where(homo_edge, dst_same, dst_uniform)
            keys.append(src * 64 + dst)
        key = np.unique(np.concatenate(keys))
        want = np.bincount(key // 64, minlength=64)
        assert np.array_equal(np.asarray(g.homo.deg), want)
    finally:
        synthetic.PRESETS.pop("_test-directed")
        synthetic._DIRECTED_PRESETS.discard("_test-directed")
