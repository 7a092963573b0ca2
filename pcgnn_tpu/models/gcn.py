"""GCN baseline over the homogeneous relation.

Reimplements ``GCN`` / ``GCNAggregator`` / ``GCNEncoder``
(``src/graphsage.py:154-275``): batch-masked aggregation over *all*
neighbors plus self, normalized by 1/sqrt(rowsum) (the reference's row-only
approximation of symmetric normalization — column norm is commented out at
``src/graphsage.py:224-226``), then ``embeds = ReLU(W agg^T)`` and a linear
head; ``to_prob`` is a sigmoid (``src/graphsage.py:172-174``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcgnn_tpu.graph.csr import MultiRelGraph
from pcgnn_tpu.models.initializers import xavier_uniform
from pcgnn_tpu.models.lossfns import int_label_ce
from pcgnn_tpu.ops.aggregate import (
    batch_neighbor_window,
    self_union_feature_window,
    union_self_window,
    window_sum_from_gathered,
)
from pcgnn_tpu.ops.hub import hub_mean_sum


class GCN:
    def __init__(self, feat_dim: int, emb_dim: int, num_classes: int = 2, **_):
        self.feat_dim = feat_dim
        self.emb_dim = emb_dim
        self.num_classes = num_classes

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        return {
            # GCNEncoder.weight is [emb, F] (src/graphsage.py:255-257);
            # stored transposed here so the forward is x @ w.
            "enc": {"w": xavier_uniform(k1, (self.feat_dim, self.emb_dim))},
            "head": {"w": xavier_uniform(k2, (self.emb_dim, self.num_classes))},
        }

    def _aggregate(self, graph: MultiRelGraph, batch: jax.Array, norm: str):
        rel = graph.homo
        x = graph.features
        x_padded = (graph.features_pad if graph.features_pad is not None
                    else jnp.concatenate(
                        [x, jnp.zeros((1, x.shape[1]), x.dtype)]))
        if rel.ewin is not None:
            # contiguous-DMA feature window (graph.csr.attach_edge_windows)
            xw, keep = self_union_feature_window(rel, batch, x)
        else:
            nbr, valid = batch_neighbor_window(rel, batch, allow_capped=True)
            nbr, keep = union_self_window(nbr, valid, batch)  # graphsage.py:210
            xw = x_padded[nbr]
        if rel.has_hubs:
            # rows above the window cap aggregate blockwise (ops.hub);
            # mask them out of the window lane (incl. the union-self column)
            is_hub = rel.deg[batch] > rel.window_width
            keep = keep & ~is_hub[:, None]
        num, cnt = window_sum_from_gathered(xw, keep)
        if rel.has_hubs:
            h_num, h_cnt = hub_mean_sum(rel, batch, is_hub, x_padded,
                                        include_self=True)
            num = jnp.where(is_hub[:, None], h_num, num)
            cnt = jnp.where(is_hub, h_cnt, cnt)
        denom = jnp.maximum(cnt, 1.0)
        if norm == "sqrt":  # GCN row normalization (src/graphsage.py:224-226)
            denom = jnp.sqrt(denom)
        return num / denom[:, None]

    def forward(self, params, graph: MultiRelGraph, batch: jax.Array,
                batch_labels=None, *, train: bool = True, **_):
        agg = self._aggregate(graph, batch, norm="sqrt")        # [B, F]
        embeds = jax.nn.relu(jnp.dot(agg, params["enc"]["w"],
                                     preferred_element_type=jnp.float32))
        logits = jnp.dot(embeds, params["head"]["w"],
                         preferred_element_type=jnp.float32)
        return logits, None

    def to_prob(self, params, graph, batch, *, train: bool = False, **kw):
        logits, _ = self.forward(params, graph, batch, train=train, **kw)
        return jax.nn.sigmoid(logits), None

    def loss(self, params, graph, batch, batch_labels,
             batch_weight: Optional[jax.Array] = None, **_):
        logits, _ = self.forward(params, graph, batch, batch_labels, train=True)
        ce = int_label_ce(logits, batch_labels)
        if batch_weight is None:
            batch_weight = jnp.ones_like(ce)
        return jnp.sum(ce * batch_weight) / jnp.maximum(jnp.sum(batch_weight), 1.0)
