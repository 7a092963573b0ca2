"""Loss primitives shared by the model heads.

``int_label_ce`` replaces ``optax.softmax_cross_entropy_with_integer_labels``
on the training hot path: optax extracts the label logit with
``take_along_axis`` — a gather, which on TPU pays a fixed per-dispatch cost
(~30 us) that dwarfs the [B, C] math.  With C=2 (this framework's heads,
reference ``src/model.py:38``) a fused one-hot compare+sum is exact and
gather-free.  Math: CE = logsumexp(logits) - logits[label], identical to
``log_softmax`` picked at the label (reference ``nn.CrossEntropyLoss``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def int_label_ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """[B] cross-entropy of integer ``labels`` under ``logits`` [B, C]."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    cls = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    picked = jnp.sum(jnp.where(cls == labels[:, None], logits, 0.0), axis=-1)
    return lse - picked
