import jax
import jax.numpy as jnp
import numpy as np

from pcgnn_tpu.sampling.pick import pick_probs, pick_step


def test_pick_probs_label_frequency():
    # reference lf: y=0 -> |train|, y=1 -> |train_pos|  (src/utils.py:276)
    y = jnp.asarray([0, 1, 0, 1, 1])
    deg = jnp.asarray([10, 10, 20, 30, 30])
    w = np.asarray(pick_probs(deg, y))
    n, npos = 5.0, 3.0
    expect = np.array([10 / n, 10 / npos, 20 / n, 30 / npos, 30 / npos])
    np.testing.assert_allclose(w, expect, rtol=1e-6)


def test_pick_step_distribution():
    idx = jnp.asarray([100, 200, 300], jnp.int32)
    w = jnp.asarray([1.0, 2.0, 7.0])
    draws = np.asarray(pick_step(jax.random.key(0), idx, w, 20000))
    freq = np.array([(draws == v).mean() for v in [100, 200, 300]])
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.7], atol=0.02)


def test_pick_step_with_replacement():
    idx = jnp.asarray([5, 9], jnp.int32)
    draws = np.asarray(pick_step(jax.random.key(1), idx,
                                 jnp.asarray([1.0, 1.0]), 100))
    assert len(draws) == 100  # more draws than population => replacement
    assert set(np.unique(draws)) <= {5, 9}
