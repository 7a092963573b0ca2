"""SPMD PC-GNN training step: data-parallel batches × graph-partitioned
features, written with ``shard_map`` so the communication pattern is explicit
(SURVEY.md §2 "first-class components to add").

Layout over the ('data', 'graph') mesh:
  * batch / labels / weights    : sharded over 'data'   -> [B/dd] per device
  * node features               : sharded over 'graph'  -> [N_pad/dg, F]
  * params, CSR index arrays    : replicated
Communication per step:
  * all-gather of the label-aware score channel over 'graph' — the *halo*:
    the only nodewise quantity the choose step needs for remote neighbors is
    this one scalar per node, so the halo is N floats, not N×F.
  * psum over 'graph' of per-block partial aggregates (mask-block @ X-block)
    and of self-feature gathers — edge-partition reduction instead of
    feature all-gather.
  * psum over 'data' inside the loss mean; parameter gradients are reduced
    by shard_map's transpose of the replicated-in broadcast.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcgnn_tpu.graph.csr import MultiRelGraph
from pcgnn_tpu.models.pcgnn import PCGNN
from pcgnn_tpu.ops.aggregate import (
    batch_neighbor_window,
    choose_keep_mask,
    dedup_minor_keep,
    oversample_candidates,
    oversample_keep,
)

shard_map = jax.shard_map


def pad_graph_for_mesh(graph: MultiRelGraph, mesh: Mesh):
    """Pad the feature table so its rows divide the 'graph' axis; returns
    (features_padded [N_pad, F] placed with a sharded layout, N_pad)."""
    dg = mesh.shape["graph"]
    n = graph.num_nodes
    n_pad = ((n + dg - 1) // dg) * dg
    feats = graph.features
    if n_pad != n:
        feats = jnp.concatenate(
            [feats, jnp.zeros((n_pad - n, feats.shape[1]), feats.dtype)])
    feats = jax.device_put(feats, NamedSharding(mesh, P("graph", None)))
    return feats, n_pad


def _block_partials(ids, keep, col_lo, block, x_local):
    """Gather-based partial sums over this device's node-row block: returns
    (partial_num [B, F], partial_cnt [B]) for the kept ids that fall in the
    block.  Scatter-free (see ``ops.aggregate.window_mean_aggregate``)."""
    local = ids - col_lo
    in_block = keep & (local >= 0) & (local < block)
    w = in_block.astype(x_local.dtype)
    xg = x_local[jnp.clip(local, 0, block - 1)]
    if ids.ndim == 1:  # shared id vector (train_pos): [P] ids, [B, P] keep
        num = jnp.einsum("bp,pf->bf", w, xg)
    else:              # per-row windows: [B, D] ids
        num = jnp.einsum("bd,bdf->bf", w, xg)
    return num, jnp.sum(w, axis=-1)


def spmd_loss_fn(model: PCGNN, graph: MultiRelGraph, mesh: Mesh, n_pad: int):
    """Build the shard_map'd
    loss(params, x_sharded, relations, batch, y, w, tp, tpv).

    The relation CSR arrays are an *argument* (replicated spec), not a
    closure: closed-over arrays are baked into the compiled program as
    literals, which overflows compile payloads at stress scale (same fix as
    the single-chip trainer)."""
    block = n_pad // mesh.shape["graph"]

    def body(params, x_local, relations, batch, y, w, train_pos,
             train_pos_valid):
        # ---- halo exchange: label-aware scores -------------------------- #
        clf = params["label_clf"]
        scores_local = jnp.dot(x_local, clf["w"], precision="highest",
                               preferred_element_type=jnp.float32) + clf["b"]
        scores_full = jax.lax.all_gather(
            scores_local, "graph", axis=0, tiled=True)        # [N_pad, 2]
        s0_padded = jnp.concatenate(
            [scores_full[:, 0], jnp.zeros((1,), scores_full.dtype)])
        center_scores = scores_full[batch]                    # [Bd, 2]

        col_lo = jax.lax.axis_index("graph") * block

        # self feature rows, reduced over the graph axis
        local_ids = batch - col_lo
        in_blk = (local_ids >= 0) & (local_ids < block)
        self_part = jnp.where(
            in_blk[:, None],
            x_local[jnp.clip(local_ids, 0, block - 1)], 0.0)
        self_feats = jax.lax.psum(self_part, "graph")          # [Bd, F]

        m_max = max(1, min(
            int(train_pos.shape[0]),
            int(max(rel.ksample_max for rel in graph.relations) * model.rho)))
        cand_ids, cand_valid, _ = oversample_candidates(
            batch, s0_padded, train_pos, train_pos_valid, m_max)

        rel_embs = []
        for r, rel in enumerate(relations):
            nbr, valid = batch_neighbor_window(rel, batch)
            keep = choose_keep_mask(rel, batch, nbr, valid, s0_padded)
            # oversampled minority positives for fraud centers, deduplicated
            # against kept neighbors (set semantics, src/layers.py:694)
            keep_minor = oversample_keep(rel, batch, y, cand_valid, model.rho)
            keep_minor = dedup_minor_keep(nbr, keep, rel.num_nodes,
                                          cand_ids, keep_minor)

            num_n, cnt_n = _block_partials(nbr, keep, col_lo, block, x_local)
            num_m, cnt_m = _block_partials(cand_ids, keep_minor, col_lo,
                                           block, x_local)
            num = jax.lax.psum(num_n + num_m, "graph")          # [Bd, F]
            cnt = jax.lax.psum(cnt_n + cnt_m, "graph")          # [Bd]
            agg = num / jnp.maximum(cnt, 1.0)[:, None]

            cat = jnp.concatenate([self_feats, agg], axis=1)
            h = jax.nn.relu(jnp.dot(cat, params["intra"][r]["w"],
                                    preferred_element_type=jnp.float32))
            rel_embs.append(h)

        cat_all = jnp.concatenate([self_feats] + rel_embs, axis=1)
        combined = jax.nn.relu(jnp.dot(cat_all, params["inter"]["w"],
                                       preferred_element_type=jnp.float32))
        gnn_logits = jnp.dot(combined, params["head"]["w"],
                             preferred_element_type=jnp.float32)

        ce_gnn = optax.softmax_cross_entropy_with_integer_labels(gnn_logits, y)
        ce_lab = optax.softmax_cross_entropy_with_integer_labels(
            center_scores, y)
        num = jax.lax.psum(jnp.sum((ce_gnn + model.alpha * ce_lab) * w), "data")
        den = jax.lax.psum(jnp.sum(w), "data")
        return num / jnp.maximum(den, 1.0)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("graph", None), P(), P("data"), P("data"),
                  P("data"), P(), P()),
        out_specs=P(),
        check_vma=False,
    )


def make_spmd_train_step(model: PCGNN, graph: MultiRelGraph, mesh: Mesh,
                         tx: optax.GradientTransformation,
                         x_sharded: jax.Array, n_pad: int):
    """Jitted SPMD step: (params, opt_state, batch, y, w, tp, tpv) ->
    (params, opt_state, loss)."""
    loss_fn = spmd_loss_fn(model, graph, mesh, n_pad)

    @partial(jax.jit, donate_argnums=(0, 1))
    def _step(params, opt_state, x_sharded, relations, batch, y, w,
              train_pos, train_pos_valid):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, x_sharded, relations, batch, y, w,
                              train_pos, train_pos_valid))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params, opt_state, batch, y, w, train_pos, train_pos_valid):
        return _step(params, opt_state, x_sharded, graph.relations, batch,
                     y, w, train_pos, train_pos_valid)

    return step


def shard_batch(mesh: Mesh, *arrays):
    """Place batch-axis arrays with a 'data'-sharded layout."""
    out = [jax.device_put(a, NamedSharding(mesh, P("data")))
           for a in arrays]
    return out if len(out) > 1 else out[0]
