"""Native C++ graph core vs the numpy oracle path."""

import numpy as np
import pytest

from pcgnn_tpu import native


def _numpy_csr(src, dst, n, symmetrize=True, self_loops=True):
    s, d = np.asarray(src, np.int64), np.asarray(dst, np.int64)
    if symmetrize:
        s, d = np.concatenate([s, d]), np.concatenate([d, s])
    if self_loops:
        loops = np.arange(n, dtype=np.int64)
        s, d = np.concatenate([s, loops]), np.concatenate([d, loops])
    key = np.unique(s * n + d)
    s, d = key // n, key % n
    deg = np.bincount(s, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    return indptr, d, s


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library not built")


@needs_native
@pytest.mark.parametrize("symmetrize,self_loops", [
    (True, True), (True, False), (False, True), (False, False)])
def test_build_csr_matches_numpy(symmetrize, self_loops):
    rng = np.random.default_rng(0)
    n, e = 500, 4000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    # duplicates + self edges in the input
    src[:100] = src[100:200]
    dst[:100] = dst[100:200]
    src[200:210] = dst[200:210]

    want = _numpy_csr(src, dst, n, symmetrize, self_loops)
    got = native.build_csr(src, dst, n, symmetrize=symmetrize,
                           add_self_loops=self_loops)
    for w, g, name in zip(want, got, ("indptr", "col", "row")):
        np.testing.assert_array_equal(g, w, err_msg=name)


@needs_native
def test_build_csr_drops_out_of_range():
    src = np.array([0, 1, 7, -1], dtype=np.int64)
    dst = np.array([1, 2, 0, 0], dtype=np.int64)
    indptr, col, row = native.build_csr(src, dst, 3, symmetrize=True,
                                        add_self_loops=False)
    assert indptr[-1] == 4  # (0,1),(1,0),(1,2),(2,1)
    np.testing.assert_array_equal(col, [1, 0, 2, 1])


@needs_native
def test_build_csr_empty():
    indptr, col, row = native.build_csr(
        np.empty(0, np.int64), np.empty(0, np.int64), 4,
        symmetrize=True, add_self_loops=True)
    np.testing.assert_array_equal(indptr, [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(col, [0, 1, 2, 3])


@needs_native
def test_csr_from_edges_uses_native_and_matches():
    # end-to-end: RelGraph built with native lib == RelGraph built with numpy
    from pcgnn_tpu.graph import csr as csr_mod
    rng = np.random.default_rng(1)
    n, e = 300, 2500
    src, dst = rng.integers(0, n, e), rng.integers(0, n, e)
    g_native = csr_mod.csr_from_edges(src, dst, n)

    import unittest.mock as mock
    with mock.patch.object(native, "available", return_value=False):
        g_numpy = csr_mod.csr_from_edges(src, dst, n)

    np.testing.assert_array_equal(np.asarray(g_native.indptr),
                                  np.asarray(g_numpy.indptr))
    np.testing.assert_array_equal(np.asarray(g_native.col),
                                  np.asarray(g_numpy.col))
    np.testing.assert_array_equal(np.asarray(g_native.keff),
                                  np.asarray(g_numpy.keff))
    assert g_native.dmax == g_numpy.dmax
