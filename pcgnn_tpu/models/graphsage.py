"""GraphSAGE baseline over the homogeneous relation.

Reimplements ``GraphSage`` / ``MeanAggregator`` / ``Encoder``
(``src/graphsage.py:16-150``) as configured by the reference trainer:
``gcn=True`` (``src/model_handler.py:96-98``), which means self-loop union,
mean aggregation, *no* self-concat, and no neighbor subsampling (the
aggregator is called without ``num_sample``, ``src/graphsage.py:133``).

``to_prob`` in the reference calls ``F.log_softmax(..., dim=2)`` on a 2-D
tensor (``src/graphsage.py:33-35``) — invalid for the active eval path; here
it returns softmax probabilities over the class axis, which is what the
metric code consumes.

``num_sample`` implements the aggregator's optional uniform neighbor
subsampling (``random.sample`` when ``len(neighs) >= num_sample``,
``src/graphsage.py:70-76``): rows with more than ``num_sample`` neighbors
keep a uniform random subset, smaller rows keep everything.  Pass a ``key``
to ``forward``/``loss`` for fresh randomness per step (defaults to a fixed
key, matching deterministic evaluation).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcgnn_tpu.graph.csr import MultiRelGraph
from pcgnn_tpu.models.initializers import xavier_uniform
from pcgnn_tpu.models.lossfns import int_label_ce
from pcgnn_tpu.ops.aggregate import (
    batch_feature_window,
    batch_neighbor_window,
    union_self_window,
    window_sum_from_gathered,
)
from pcgnn_tpu.ops.hub import hub_mean_sum


class GraphSage:
    def __init__(self, feat_dim: int, emb_dim: int, num_classes: int = 2,
                 gcn_style: bool = True, num_sample: Optional[int] = None, **_):
        self.feat_dim = feat_dim
        self.emb_dim = emb_dim
        self.num_classes = num_classes
        self.gcn_style = gcn_style
        self.num_sample = num_sample

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        in_dim = self.feat_dim if self.gcn_style else 2 * self.feat_dim
        return {
            "enc": {"w": xavier_uniform(k1, (in_dim, self.emb_dim))},
            "head": {"w": xavier_uniform(k2, (self.emb_dim, self.num_classes))},
        }

    def forward(self, params, graph: MultiRelGraph, batch: jax.Array,
                batch_labels=None, *, train: bool = True,
                key: Optional[jax.Array] = None, **_):
        rel = graph.homo
        if self.num_sample is not None and rel.has_hubs:
            raise ValueError(
                "GraphSage num_sample subsampling draws uniformly from the "
                "FULL neighbor list (src/graphsage.py:70-76), which a "
                "window-capped relation cannot expose; rebuild the graph "
                "with window_cap disabled or drop num_sample.")
        use_ewin = rel.ewin is not None
        if use_ewin:
            # contiguous-DMA feature window (graph.csr.attach_edge_windows);
            # ids still come from the cheap [B]-row nbr2d gather (needed for
            # the conditional self union below)
            d_w = max(rel.window_width, 1)
            degs = jnp.minimum(rel.deg[batch], d_w)
            offs = jax.lax.broadcasted_iota(
                jnp.int32, (batch.shape[0], d_w), 1)
            valid = offs < degs[:, None]
            nbr = rel.nbr2d[batch]
            xw = batch_feature_window(rel, batch, graph.features.shape[1])
        else:
            nbr, valid = batch_neighbor_window(rel, batch, allow_capped=True)
        if self.num_sample is not None:
            # uniform subsample of rows larger than num_sample: random
            # per-slot priorities, keep the num_sample smallest valid ranks
            # (reference random.sample, src/graphsage.py:70-76)
            if key is None:
                key = jax.random.key(0)
            pri = jax.random.uniform(key, nbr.shape)
            pri = jnp.where(valid, pri, jnp.inf)
            rank = jnp.argsort(jnp.argsort(pri, axis=1, stable=True), axis=1,
                               stable=True)
            valid = valid & (rank < self.num_sample)
        x = graph.features
        x_padded = (graph.features_pad if graph.features_pad is not None
                    else jnp.concatenate(
                        [x, jnp.zeros((1, x.shape[1]), x.dtype)]))
        if self.gcn_style:
            if use_ewin:  # append the conditional self column to the window
                present = jnp.any((nbr == batch[:, None]) & valid, axis=1)
                xw = jnp.concatenate([xw, x[batch][:, None, :]], axis=1)
                valid = jnp.concatenate([valid, ~present[:, None]], axis=1)
            else:
                nbr, valid = union_self_window(nbr, valid, batch)
        if not use_ewin:
            xw = x_padded[nbr]
        if rel.has_hubs:
            is_hub = rel.deg[batch] > rel.window_width
            valid = valid & ~is_hub[:, None]
        num, cnt = window_sum_from_gathered(xw, valid)
        if rel.has_hubs:
            h_num, h_cnt = hub_mean_sum(rel, batch, is_hub, x_padded,
                                        include_self=self.gcn_style)
            num = jnp.where(is_hub[:, None], h_num, num)
            cnt = jnp.where(is_hub, h_cnt, cnt)
        neigh = num / jnp.maximum(cnt, 1.0)[:, None]
        if self.gcn_style:
            combined = neigh
        else:
            combined = jnp.concatenate([graph.features[batch], neigh], axis=1)
        embeds = jax.nn.relu(jnp.dot(combined, params["enc"]["w"],
                                     preferred_element_type=jnp.float32))
        logits = jnp.dot(embeds, params["head"]["w"],
                         preferred_element_type=jnp.float32)
        return logits, None

    def to_prob(self, params, graph, batch, *, train: bool = False, **kw):
        logits, _ = self.forward(params, graph, batch, train=train, **kw)
        return jax.nn.softmax(logits, axis=-1), None

    def loss(self, params, graph, batch, batch_labels,
             batch_weight: Optional[jax.Array] = None,
             key: Optional[jax.Array] = None, **_):
        logits, _ = self.forward(params, graph, batch, batch_labels,
                                 train=True, key=key)
        ce = int_label_ce(logits, batch_labels)
        if batch_weight is None:
            batch_weight = jnp.ones_like(ce)
        return jnp.sum(ce * batch_weight) / jnp.maximum(jnp.sum(batch_weight), 1.0)
