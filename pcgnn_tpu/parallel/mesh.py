"""Device mesh construction.

The reference has no distribution layer at all (SURVEY.md §2: single process,
single GPU; fleet launcher only places independent runs).  pcgnn_tpu scales
over a 2-D logical mesh:

  * ``data``  — batch (pick-sample) sharding: classic DP.
  * ``graph`` — node/edge partition sharding: features are sharded by node
    row blocks, relation aggregation computes per-block partial sums and
    reduces over the axis — the graph analogue of tensor/sequence
    parallelism, with the label-aware score vector all-gathered as the halo.

On ICI-connected slices put ``graph`` on the inner (fastest) axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(data: Optional[int] = None, graph: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'graph') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // graph
    if data * graph != n:
        raise ValueError(f"mesh {data}x{graph} != {n} devices")
    import numpy as np

    arr = np.asarray(devices).reshape(data, graph)
    return Mesh(arr, axis_names=("data", "graph"))


def factor_mesh(n_devices: int) -> tuple:
    """Default (data, graph) factorization for n devices: graph axis gets 2
    when possible, the rest goes to data."""
    graph = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    return n_devices // graph, graph
