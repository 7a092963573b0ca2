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
