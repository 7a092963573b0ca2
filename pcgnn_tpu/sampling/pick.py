"""The *pick* step: label-balanced, degree/label-frequency-weighted node
sampling (``src/utils.py:274-278``).

  P(v) ∝ deg_homo(v) / LF(v),
  LF(v) = |train|       if y_v = 0      (label frequency of the majority)
        = |train_pos|   if y_v = 1      (the reference computes this as
                                         (Σy - |train|)·y + |train|)

and 2·|train_pos| nodes are drawn *with replacement* per epoch
(``src/model_handler.py:130``).  Runs on device with ``jax.random`` so the
whole epoch can live inside one jitted scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pick_probs(deg_train: jax.Array, y_train: jax.Array) -> jax.Array:
    """Unnormalized sampling weights for the training nodes.

    Args:
      deg_train: [T] degrees of training nodes in the *homo* graph
        (self-loops included, as the reference's adjlists contain them).
      y_train: [T] labels in {0, 1}.
    """
    y = y_train.astype(jnp.float32)
    n = jnp.float32(y_train.shape[0])
    lf = (jnp.sum(y) - n) * y + n          # y=0 -> |train|, y=1 -> |train_pos|
    return deg_train.astype(jnp.float32) / lf


def pick_step(key: jax.Array, idx_train: jax.Array, weights: jax.Array,
              size: int) -> jax.Array:
    """Draw ``size`` training node ids with replacement, P ∝ weights.

    Inverse-CDF sampling: one [T] cumsum + a sorted search of ``size``
    uniforms.  O(T + S·log T) — ``jax.random.categorical`` would stream a
    [S, T] Gumbel tensor (1e10+ elements at stress scale: S ~ 4e4 draws
    against T ~ 4e5 training nodes, per epoch).  Identical distribution,
    different random stream (the reference's ``random.choices`` stream is
    not reproducible from torch seeds either; parity is statistical,
    ``tests/test_sampling.py``).
    """
    cdf = jnp.cumsum(weights.astype(jnp.float32))
    total = cdf[-1]
    u = jax.random.uniform(key, (size,), dtype=jnp.float32, maxval=1.0) * total
    draws = jnp.searchsorted(cdf, u, side="right", method="sort")
    draws = jnp.minimum(draws, weights.shape[0] - 1)
    return idx_train[draws]
