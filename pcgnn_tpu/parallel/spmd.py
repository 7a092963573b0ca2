"""SPMD PC-GNN: data-parallel batches × edge/row-partitioned graph structure,
written with ``shard_map`` so the communication pattern is explicit
(SURVEY.md §2 "first-class components to add").

Layout over the ('data', 'graph') mesh:
  * batch / labels / weights : sharded over 'data'  -> [B/dd] per device
  * node features            : sharded over 'graph' -> [N_pad/dg, F]
  * graph structure          : sharded over 'graph' — each relation is a
    :class:`ShardedRel` whose dense neighbor table (``nbr2d``) and degree
    vectors are row-block partitioned, so per-device graph bytes are
    ~1/dg of the total (nothing structural is replicated).
  * params                   : replicated (they are KBs).

The step is *owner-computes-selection*:
  1. halo — every device computes label-aware scores for its feature rows;
     one ``all_gather`` over 'graph' makes the [N_pad, 2] score table
     global.  This is the only nodewise halo: choose needs exactly one
     scalar per node (score channel 0), never the [N, F] features.
  2. choose — for each batch row, the device owning that row's block reads
     its neighbor window from the local ``nbr2d`` shard and computes the
     keep mask (keff-nearest by score distance).  The kept window is then
     published to the other graph-shards with a ``psum`` of an
     exactly-one-owner encoding (kept id+1, else 0): each row has one
     owner, so the sum *is* the owner's value.  Comm: O(B·D) int32 per
     relation — proportional to touched edges, never to N.
  3. aggregate — every device gathers the feature rows of kept ids that
     fall in its local block and contributes a partial (sum, count);
     ``psum`` over 'graph' completes the mean.  Same for the oversampled
     minority candidates and the self rows.
  4. loss — ``psum`` over 'data' inside the weighted CE mean; parameter
     grads reduce through shard_map's transpose of the replicated-in
     broadcast.

Note the graph axis shards *memory* (structure + features), and the
selection *compute* (each owner ranks only its rows); the aggregation
contraction itself is replicated across 'graph' (every shard scans the full
kept window to find its rows).  For PC-GNN's F<=100-dim features that
contraction is a trivial slice of the step; the win this layer exists for
is fitting graphs whose structure does not fit one chip.

Capped (hub-lane) relations are not supported here yet: the blockwise hub
lane reads CSR tails, which this layout deliberately does not replicate.
Shard such graphs rebuilt with ``window_cap=dmax`` (uncapped), or train
single-chip where ``ops.hub`` applies.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcgnn_tpu.graph.csr import MultiRelGraph, RelGraph
from pcgnn_tpu.models.pcgnn import PCGNN
from pcgnn_tpu.ops.aggregate import keep_nearest, oversample_candidates_values

shard_map = jax.shard_map

_INF = float("inf")  # python float: keep imports free of backend init


def data_axes(mesh: Mesh) -> tuple:
    """The batch-sharding axes of a mesh: ('data',) on single-host
    ('data','graph') meshes, ('dcn','data') on multi-host
    ('dcn','data','graph') meshes (see ``parallel.distributed``).  Batch
    arrays shard over all of them; the loss psum reduces over all of them
    — the 'dcn' hop is the only collective that crosses hosts besides the
    score all-gather."""
    return tuple(n for n in mesh.axis_names if n in ("dcn", "data"))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedRel:
    """One relation's structure, row-block sharded over the 'graph' axis.

    Replaces the replicated CSR of the round-1 layer: only the dense
    neighbor table and the per-node degree vectors exist, each placed with
    a P('graph', ...) sharding, so every device hosts ~1/dg of the bytes.
    Rows are padded to ``n_pad`` (zero degree, sentinel neighbors).
    """

    nbr2d: jax.Array    # [N_pad, D] int32, P('graph', None); pad slots = N
    deg: jax.Array      # [N_pad] int32, P('graph')
    keff: jax.Array     # [N_pad] int32, P('graph')
    ksample: jax.Array  # [N_pad] int32, P('graph')
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    ksample_max: int = dataclasses.field(default=0,
                                         metadata=dict(static=True))


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


def shard_relation(rel: RelGraph, mesh: Mesh, n_pad: int) -> ShardedRel:
    """Row-block partition one relation over the mesh's 'graph' axis.

    The dense [N, D] neighbor table (built at graph construction when it
    fits one chip's budget, else rebuilt here from the host CSR — sharded
    it only needs to fit 1/dg per device) plus deg/keff/ksample become
    'graph'-sharded device arrays; indptr/col are NOT carried at all.
    """
    if rel.is_stub:
        raise ValueError("cannot shard a degree-only stub relation "
                         "(graph.csr.degree_stub): it has no edges")
    if rel.has_hubs:
        raise NotImplementedError(
            f"SPMD graph sharding does not support window-capped relations "
            f"yet (dcap={rel.window_width} < dmax={rel.dmax}): the hub lane "
            f"reads CSR edge tails, which the sharded layout drops. Rebuild "
            f"with csr_from_edges(window_cap=<dmax>) or train single-chip.")
    n, d = rel.num_nodes, max(rel.window_width, 1)
    if rel.nbr2d is not None:
        nbr2d = np.asarray(rel.nbr2d)
    else:
        # beyond the single-chip table budget: build on host, shard on put
        indptr = np.asarray(rel.indptr)
        col = np.asarray(rel.col[: rel.num_edges])
        nbr2d = np.full((n, d), n, dtype=np.int32)
        if len(col):
            rows = np.repeat(np.arange(n), np.diff(indptr))
            slots = np.arange(len(col)) - indptr[rows]
            nbr2d[rows, slots] = col
    if n_pad != n:
        pad = np.full((n_pad - n, d), n, dtype=np.int32)
        nbr2d = np.concatenate([nbr2d, pad])

    def padvec(v):
        v = np.asarray(v)
        return np.concatenate([v, np.zeros(n_pad - n, v.dtype)])

    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    return ShardedRel(
        nbr2d=put(nbr2d, P("graph", None)),
        deg=put(padvec(rel.deg), P("graph")),
        keff=put(padvec(rel.keff), P("graph")),
        ksample=put(padvec(rel.ksample), P("graph")),
        num_nodes=n,
        width=d,
        ksample_max=rel.ksample_max,
    )


def shard_relations(graph: MultiRelGraph, mesh: Mesh, n_pad: int) -> tuple:
    return tuple(shard_relation(r, mesh, n_pad) for r in graph.relations)


def _owner_pick(mine, values, axis="graph"):
    """psum-broadcast of per-row values each held by exactly one owner
    device (rows where ``mine`` is False contribute zero)."""
    z = jnp.where(mine if values.ndim == 1 else mine[:, None], values, 0)
    return jax.lax.psum(z, axis)


def _block_partials(ids, keep, col_lo, block, x_local):
    """Gather-based partial sums over this device's feature-row block:
    (partial_num [B, F], partial_cnt [B]) for the kept ids in the block.
    Scatter-free (see ``ops.aggregate.window_mean_aggregate``)."""
    local = ids - col_lo
    in_block = keep & (local >= 0) & (local < block)
    w = in_block.astype(x_local.dtype)
    xg = x_local[jnp.clip(local, 0, block - 1)]
    num = jnp.einsum("bd,bdf->bf", w, xg)
    return num, jnp.sum(w, axis=-1)


def spmd_forward_fn(model: PCGNN, mesh: Mesh, n_pad: int, shards: tuple,
                    *, train: bool):
    """Build the shard_map'd forward
    (params, x_local, shards, batch, tp, tpv, y) ->
    (gnn_logits [Bd, C], center_scores [Bd, C]), both 'data'-sharded.

    Math identical to ``models.pcgnn.PCGNN.forward`` (parity-tested); see
    the module docstring for the communication schedule.  ``y`` (labels)
    is consumed only when ``train`` (fraud-center oversampling).

    ``shards`` (the actual :class:`ShardedRel` tuple) is needed at build
    time only to derive the in_specs pytree (static fields must match);
    the arrays still enter as traced arguments, not closed-over literals.
    """
    block = n_pad // mesh.shape["graph"]
    rho = model.rho
    daxes = data_axes(mesh)
    shards_spec = tuple(
        dataclasses.replace(sh, nbr2d=P("graph", None), deg=P("graph"),
                            keff=P("graph"), ksample=P("graph"))
        for sh in shards)

    def body(params, x_local, shards, batch, train_pos, train_pos_valid, y):
        clf = params["label_clf"]
        # ---- halo: label-aware scores, one all-gather over 'graph' ------ #
        scores_local = jnp.dot(x_local, clf["w"], precision="highest",
                               preferred_element_type=jnp.float32) + clf["b"]
        scores_full = jax.lax.all_gather(
            scores_local, "graph", axis=0, tiled=True)        # [N_pad, 2]
        center_scores = scores_full[batch]                    # [Bd, 2]
        # selection is non-differentiable (label_clf learns only through
        # the similarity loss, src/model.py:54-61)
        s0 = jax.lax.stop_gradient(scores_full[:, 0])         # [N_pad]
        center_s0 = s0[batch]

        col_lo = jax.lax.axis_index("graph") * block
        local = batch - col_lo
        mine = (local >= 0) & (local < block)
        lclip = jnp.clip(local, 0, block - 1)

        # self feature rows, reduced over the graph axis
        self_feats = _owner_pick(mine, x_local[lclip])         # [Bd, F]

        if train:
            m_max = max(1, min(
                int(train_pos.shape[0]),
                int(max(sh.ksample_max for sh in shards) * rho)))
            cand_ids, cand_valid, _ = oversample_candidates_values(
                center_s0, s0[train_pos], train_pos, train_pos_valid, m_max)
            is_fraud = (y == 1)

        rel_embs = []
        for r, sh in enumerate(shards):
            d = sh.width
            # ---- owner computes the window + choose keep mask ---------- #
            nbr_mine = sh.nbr2d[lclip]                         # [Bd, D] local
            deg_mine = jnp.minimum(sh.deg[lclip], d)
            offs = jax.lax.broadcasted_iota(
                jnp.int32, (batch.shape[0], d), 1)
            valid = mine[:, None] & (offs < deg_mine[:, None])
            dist = jnp.abs(center_s0[:, None] - s0[jnp.clip(
                nbr_mine, 0, n_pad - 1)])
            dist = jnp.where(valid, dist, _INF)
            keep = keep_nearest(dist, sh.keff[lclip], valid)
            # ---- publish the kept window: exactly-one-owner psum ------- #
            enc = jnp.where(keep, nbr_mine + 1, 0)             # 0 = not kept
            enc = jax.lax.psum(enc, "graph")                   # [Bd, D]
            kept_ids = enc - 1
            kept = enc > 0
            ks = _owner_pick(mine, sh.ksample[lclip])          # [Bd]

            num, cnt = _block_partials(kept_ids, kept, col_lo, block, x_local)
            if train:
                # oversampled minority positives for fraud centers, dedup'd
                # against kept neighbors (set semantics, src/layers.py:694)
                m = jnp.floor(ks.astype(jnp.float32) * rho).astype(jnp.int32)
                slot = jax.lax.broadcasted_iota(
                    jnp.int32, cand_valid.shape, 1)
                keep_minor = cand_valid & (slot < m[:, None]) & is_fraud[:, None]
                kept_sent = jnp.where(kept, kept_ids, n_pad)
                dup = jnp.any(
                    cand_ids[:, :, None] == kept_sent[:, None, :], axis=2)
                keep_minor = keep_minor & ~dup
                num_m, cnt_m = _block_partials(cand_ids, keep_minor, col_lo,
                                               block, x_local)
                num, cnt = num + num_m, cnt + cnt_m
            num = jax.lax.psum(num, "graph")                   # [Bd, F]
            cnt = jax.lax.psum(cnt, "graph")                   # [Bd]
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
        return gnn_logits, center_scores

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("graph", None), shards_spec,
                  P(daxes), P(), P(), P(daxes)),
        out_specs=(P(daxes), P(daxes)),
        check_vma=False,
    )


def spmd_loss_fn(model: PCGNN, mesh: Mesh, n_pad: int, shards: tuple):
    """loss(params, x_sharded, shards, batch, y, w, tp, tpv) -> scalar.

    Joint weighted-mean CE, reduced over the 'data' axis
    (``src/model.py:47-62``; weights mask padded batch slots)."""
    fwd = spmd_forward_fn(model, mesh, n_pad, shards, train=True)
    daxes = data_axes(mesh)

    def mean_over_data(ce_joint, w):
        num = jax.lax.psum(jnp.sum(ce_joint * w), daxes)
        den = jax.lax.psum(jnp.sum(w), daxes)
        return num / jnp.maximum(den, 1.0)

    reduce_ = shard_map(mean_over_data, mesh=mesh,
                        in_specs=(P(daxes), P(daxes)), out_specs=P(),
                        check_vma=False)

    def loss(params, x_sharded, shards, batch, y, w, train_pos,
             train_pos_valid):
        gnn_logits, center_scores = fwd(params, x_sharded, shards, batch,
                                        train_pos, train_pos_valid, y)
        ce_gnn = optax.softmax_cross_entropy_with_integer_labels(gnn_logits, y)
        ce_lab = optax.softmax_cross_entropy_with_integer_labels(
            center_scores, y)
        return reduce_(ce_gnn + model.alpha * ce_lab, w)

    return loss


def spmd_predict_fn(model: PCGNN, mesh: Mesh, n_pad: int, shards: tuple):
    """probs(params, x_sharded, shards, batch, tp, tpv) -> [B, 2] sigmoid
    of the GNN head (``src/model.py:41-45``), gathered to the host."""
    fwd = spmd_forward_fn(model, mesh, n_pad, shards, train=False)

    @jax.jit
    def predict(params, x_sharded, shards, batch, train_pos, train_pos_valid):
        gnn_logits, _ = fwd(params, x_sharded, shards, batch,
                            train_pos, train_pos_valid,
                            jnp.zeros_like(batch))
        return jax.nn.sigmoid(gnn_logits)

    return predict


def make_spmd_train_step(model: PCGNN, mesh: Mesh,
                         tx: optax.GradientTransformation,
                         x_sharded: jax.Array, shards: tuple, n_pad: int):
    """Jitted SPMD step: (params, opt_state, batch, y, w, tp, tpv) ->
    (params, opt_state, loss)."""
    loss_fn = spmd_loss_fn(model, mesh, n_pad, shards)

    @partial(jax.jit, donate_argnums=(0, 1))
    def _step(params, opt_state, x_sharded, shards, batch, y, w,
              train_pos, train_pos_valid):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, x_sharded, shards, batch, y, w,
                              train_pos, train_pos_valid))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params, opt_state, batch, y, w, train_pos, train_pos_valid):
        return _step(params, opt_state, x_sharded, shards, batch,
                     y, w, train_pos, train_pos_valid)

    return step


def shard_batch(mesh: Mesh, *arrays):
    """Place batch-axis arrays with a data-axes-sharded layout (works for
    both single-host and ('dcn',...) multi-host meshes; every process must
    pass the same full array)."""
    spec = P(data_axes(mesh))
    out = [jax.device_put(a, NamedSharding(mesh, spec)) for a in arrays]
    return out if len(out) > 1 else out[0]
