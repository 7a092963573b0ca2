"""Parameter initializers matching the reference's torch init statistics.

The reference uses ``init.xavier_uniform_`` for aggregation weights
(``src/layers.py:56,197,560``; ``src/model.py:30``) and torch's default
``nn.Linear`` init (kaiming-uniform with a=sqrt(5), i.e. U[-1/sqrt(fan_in),
1/sqrt(fan_in)] for both weight and bias) for ``label_clf``
(``src/layers.py:200``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    bound = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    """Weight [in, out] + bias [out] with torch nn.Linear default statistics."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (out_dim,), dtype, minval=-bound, maxval=bound)
    return {"w": w, "b": b}
