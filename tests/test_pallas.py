"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by benchmarks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pcgnn_tpu.ops.aggregate import scatter_batch_mask
from pcgnn_tpu.ops.pallas.mask_build import build_batch_mask


@pytest.mark.parametrize("b,d,n", [(8, 5, 40), (13, 7, 200)])
def test_mask_build_matches_scatter(b, d, n):
    rng = np.random.default_rng(0)
    nbr_np = rng.integers(0, n, (b, d)).astype(np.int32)
    keep_np = rng.random((b, d)) < 0.5
    # add padding sentinels + duplicates
    nbr_np[:, -1] = n
    keep_np[:, -1] = False
    nbr_np[0, 1] = nbr_np[0, 0]
    keep_np[0, :2] = True

    nbr, keep = jnp.asarray(nbr_np), jnp.asarray(keep_np)
    want = np.asarray(scatter_batch_mask(n, nbr, keep))
    got = np.asarray(build_batch_mask(nbr, keep, n, interpret=True))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (b, n)
    # duplicate collapsed to 1 (set semantics)
    assert got[0, nbr_np[0, 0]] == 1.0
