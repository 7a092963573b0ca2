"""PC-GNN: one Pick-Choose-Aggregate layer, TPU-native.

Reimplements the reference model stack —
  * ``PCALayer``            (``src/model.py:13-62``)
  * ``InterAgg1/3/5``       (``src/layers.py:16-535``; one class, any R here)
  * ``IntraAgg``            (``src/layers.py:539-630``)
  * ``choose_step_neighs`` / ``choose_step_test`` (``src/layers.py:633-738``)
— as a single functional forward over static padded CSR relations.  The
Python set unions, per-node sorts and host-built masks become fixed-shape
gathers, double-argsort ranks and one dense-mask GEMM per relation
(see ``ops.aggregate``).

Math preserved (parity targets, SURVEY.md §7):
  scores      = X W_clf + b                  (label-aware scores, [N, 2])
  d(u,v)      = |scores[u,0] - scores[v,0]|  (choose distance)
  keep        : per row, the keff nearest neighbors (keff folds the
                keep-all-when-small rule), plus int(ceil(thr*deg)*rho)
                nearest train positives for fraud-labeled centers (train)
  h_r         = ReLU([x_v ; mean_{u kept} x_u] W_r)           (intra)
  combined    = ReLU([x_v ; h_1 ; ... ; h_R] W_inter)         (inter)
  gnn_logits  = combined W_head^T
  loss        = CE(gnn_logits, y) + alpha * CE(scores[batch], y)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcgnn_tpu.graph.csr import MultiRelGraph
from pcgnn_tpu.models.initializers import torch_linear, xavier_uniform
from pcgnn_tpu.models.lossfns import int_label_ce
from pcgnn_tpu.ops.aggregate import (
    _INF,
    batch_feature_window,
    batch_neighbor_window,
    dedup_minor_keep,
    keep_nearest,
    minor_sum,
    minor_sum_compact_multi,
    oversample_candidates_values,
    oversample_keep,
    window_sum_from_gathered,
)
from pcgnn_tpu.ops.hub import hub_choose_sum

# Node count above which per-step O(N) score materialization is replaced by
# lazy on-window score computation (see PCGNN.forward).  The parity-tested
# reference-scale graphs (YelpChi 46k, Amazon 12k) stay on the table path.
SCORE_FROM_WINDOW_MIN_NODES = 200_000


class PCGNN:
    """Functional PC-GNN. Hyperparameters are static; params are a pytree."""

    def __init__(self, feat_dim: int, emb_dim: int, num_relations: int,
                 alpha: float, rho: float, num_classes: int = 2,
                 learn_features: bool = False):
        self.feat_dim = feat_dim
        self.emb_dim = emb_dim
        self.num_relations = num_relations
        self.alpha = float(alpha)   # lambda_1 in the paper, config key "alpha"
        self.rho = float(rho)
        self.num_classes = num_classes
        # learned-feature variant (config ``learn_features``): the node
        # table becomes a trainable parameter (the reference's
        # ``nn.Embedding`` with requires_grad=True instead of the frozen
        # default, ``model_handler.py:85-86``), and aggregation runs the
        # dense mask-GEMM lane (``ops.aggregate.scatter_batch_mask`` +
        # ``masked_mean_aggregate``) whose VJP is itself a GEMM — the
        # scatter-free window lane has no gradient path into the table.
        self.learn_features = learn_features

    def init(self, key: jax.Array, features=None) -> dict:
        ks = jax.random.split(key, self.num_relations + 3)
        params = {
            "label_clf": torch_linear(ks[0], self.feat_dim, self.num_classes),
            "intra": [
                {"w": xavier_uniform(ks[1 + r], (2 * self.feat_dim, self.emb_dim))}
                for r in range(self.num_relations)
            ],
            "inter": {
                "w": xavier_uniform(
                    ks[self.num_relations + 1],
                    (self.feat_dim + self.num_relations * self.emb_dim, self.emb_dim))
            },
            "head": {"w": xavier_uniform(
                ks[self.num_relations + 2], (self.emb_dim, self.num_classes))},
        }
        if self.learn_features:
            if features is None:
                raise ValueError(
                    "learn_features=True: init(key, features=...) needs the "
                    "initial node table (the reference initializes the "
                    "embedding from the dataset features, "
                    "model_handler.py:85)")
            params["embed"] = jnp.asarray(features, jnp.float32)
        return params

    # ------------------------------------------------------------------ #

    def minor_window(self, num_train_pos: int, relations) -> int:
        """Static width of the compact oversample-candidate window: the
        largest ``int(ksample * rho)`` any WINDOW-LANE (non-hub) row can
        request, bounded by the candidate pool.  Hub rows' minors never go
        through this window — they are selected exactly over the sorted
        candidate table inside the hub lane (``ops.hub.chunk_minor_band``)
        — so on skew graphs the window stays O(dcap·thr·rho) instead of
        blowing up to the whole pool.  Single source of truth for
        forward(), bench.py and benchmarks/roofline.py."""
        def cap(rel):
            kc = getattr(rel, "ksample_cap", 0)
            return kc if kc else rel.ksample_max
        return max(1, min(
            int(num_train_pos),
            int(max(cap(rel) for rel in relations) * self.rho)))

    def forward(
        self,
        params: dict,
        graph: MultiRelGraph,
        batch: jax.Array,
        batch_labels: Optional[jax.Array],
        *,
        train: bool,
        train_pos: Optional[jax.Array] = None,
        train_pos_valid: Optional[jax.Array] = None,
        train_pos_feats: Optional[jax.Array] = None,
    ):
        """Returns (gnn_logits [B, C], center_scores [B, C]).

        ``train_pos_feats`` optionally supplies the pre-gathered
        ``features[train_pos]`` rows ([P, F]) — they are constant for a run
        (both the split and the feature table are frozen), so the trainer
        hoists the gather out of the step.
        """
        if self.learn_features:
            return self._forward_learned(
                params, graph, batch, batch_labels, train=train,
                train_pos=train_pos, train_pos_valid=train_pos_valid)
        x = graph.features
        n = graph.num_nodes
        f = x.shape[1]
        clf = params["label_clf"]
        # Edge-window mode: a relation carrying the edge-materialized
        # feature store (graph.csr.attach_edge_windows) gathers each window
        # as ONE contiguous DMA (ops.aggregate.batch_feature_window) instead
        # of a scattered [B, D]-row gather — the step's former bottleneck.
        # All-relations coverage (the reference-scale case) also switches
        # scoring to the window form; PARTIAL coverage (stress scale, where
        # a relation's store can exceed the HBM budget) is honored per
        # relation when the graph is already on the score-from-window
        # strategy — both lanes then compute scores with the same
        # contraction, so per-relation mixing changes nothing.
        use_ewin = bool(graph.relations) and all(
            rel.ewin is not None for rel in graph.relations)
        # Fused record store: all relations' windows in ONE DMA per batch
        # row (graph.csr._build_fused_store).  The window gather is
        # DMA-dispatch-bound (~150 ns/row), so collapsing R gathers into
        # one cuts the dominant stage ~R-fold; values are byte-identical
        # copies of the per-relation stores.
        use_fused = use_ewin and graph.fused is not None
        # Two score strategies with identical math (s = x·W_clf + b):
        #  * small graphs: ONE [N,F]x[F,2] matmul materializes every node's
        #    score; the score rides as an extra gathered feature column
        #    (replaces the reference's per-batch unique-union gather,
        #    src/layers.py:226-237).
        #  * large graphs (stress scale): per-step O(N) work dominates a
        #    B-sized batch step, so scores are computed lazily ON the
        #    gathered windows (O(B·D·F) instead of O(N·F) per step).
        #  * edge-window mode gathers plain feature windows, so it always
        #    scores on the window (same values: window rows are exact copies
        #    of x rows, contracted with the same w0).
        score_from_window = use_ewin or n >= SCORE_FROM_WINDOW_MIN_NODES
        # bfloat16 (packed) stores round the stored neighbor VALUES; for the
        # choose *ranking* to stay internally consistent (a self-loop's
        # distance exactly 0, hub and window rows of one relation scored at
        # the same precision), every selection score is then computed on the
        # bf16-rounded feature snapshot: center, candidate, hub-tail and
        # non-store window rows all round through bf16 before the s0
        # contraction.  Only selection rounds — self_feats/center_scores
        # (the loss path) and all aggregation values stay exact f32.
        packed_sel = use_ewin and any(
            rel.ewin_packed for rel in graph.relations)
        sel_round = ((lambda a: a.astype(jnp.bfloat16).astype(jnp.float32))
                     if packed_sel else (lambda a: a))
        # precision='highest': these two columns drive the choose *ranking*;
        # bf16 rounding here would perturb neighbor selection for ~free gain
        # stop_gradient on everything feeding selection: it is
        # non-differentiable (label_clf learns only through the similarity
        # loss, src/model.py:54-61), and without it the window gather grows
        # a VJP scatter-add into [N+1, F+1] that dominates the backward.
        w0 = jax.lax.stop_gradient(clf["w"][:, 0])
        b0 = jax.lax.stop_gradient(clf["b"][0])

        # packed batch constants: self features + every relation's
        # (deg, keff, ksample, estart) + neighbor ids in ONE row gather
        # (graph.csr._build_node_pack) — each separate gather pays a fixed
        # dispatch cost on TPU
        use_pack = use_ewin and graph.node_pack is not None
        if use_pack:
            prow = graph.node_pack[batch]                  # [B, C]
            self_feats = prow[:, :f]
            meta_off = f
            nbr_off = f + 4 * len(graph.relations)
            nbr_offs = []
            for rel in graph.relations:
                nbr_offs.append(nbr_off)
                nbr_off += max(rel.window_width, 1)
        else:
            self_feats = x[batch]                          # [B, F]

        def window_s0(xw_rows):
            """Selection score of feature rows ([..., F] -> [...]): the
            shared contraction every selection comparison uses."""
            return jnp.dot(xw_rows, w0, precision="highest",
                           preferred_element_type=jnp.float32) + b0

        # heavy-tailed relations route rows above the window cap through the
        # blockwise hub lane (ops.hub); its duplicate-minor subtraction needs
        # a train-positive indicator column riding the gathered rows
        any_hub = any(rel.has_hubs for rel in graph.relations)
        need_tp = train and any_hub
        if need_tp:
            tp_rows = jnp.where(train_pos_valid, train_pos, n)
            tp_mask = jnp.zeros((n + 1,), x.dtype).at[tp_rows].set(
                1.0, mode="drop")   # invalid entries land in slot n,
        extra = [tp_mask[:n, None]] if need_tp else []   # sliced away here

        if score_from_window:
            # gather plain features; scores computed on the window.  center,
            # neighbor and candidate scores all use the same [..., F]·w0
            # contraction — on the bf16-rounded snapshot for packed stores
            # (``sel_round``) — so a self-loop's distance stays exactly zero.
            center_scores = jnp.dot(
                self_feats, clf["w"], precision="highest",
                preferred_element_type=jnp.float32) + clf["b"]
            center_s0 = window_s0(sel_round(self_feats))   # [B]
            xs = None if not extra else jnp.concatenate([x] + extra, axis=1)
            s0_col = None
            tp_col = f if need_tp else None
        else:
            scores = jnp.dot(x, clf["w"], precision="highest",
                             preferred_element_type=jnp.float32) + clf["b"]
            center_scores = scores[batch]                  # [B, C]
            center_s0 = jax.lax.stop_gradient(center_scores[:, 0])
            s0_sg = jax.lax.stop_gradient(scores[:, 0])
            # XLA's scattered element gather is ~100M elem/s on TPU while
            # wide row gathers are fast, so the score rides as an extra
            # feature column: ONE [B, D, F+1] row gather per relation feeds
            # both the choose distance (column F) and the aggregation
            # (columns :F), instead of a separate s0[nbr] element gather.
            xs = jnp.concatenate([x, s0_sg[:, None]] + extra, axis=1)
            s0_col = f
            tp_col = f + 1 if need_tp else None
        clamp_ids = False
        if xs is None:
            # no extra columns: use the precomputed sentinel-padded table
            # when available.  Past the fpad HBM budget (stress scale)
            # re-concatenating would copy the WHOLE [N, F] table every
            # step (~6 ms of the 20 ms stress-10m step); instead the raw
            # table is indexed with ids CLAMPED to N-1 — every consumer
            # multiplies the gathered rows by a validity mask, so the
            # clamped rows' values never reach a sum.  Hub sweeps index
            # their CSR tails directly and keep the sentinel-row contract,
            # so clamping is only taken hub-free.
            if graph.features_pad is not None:
                xs = graph.features_pad
            elif not any_hub:
                xs = x
                clamp_ids = True
            else:
                xs = jnp.concatenate([x, jnp.zeros((1, f), x.dtype)])
        else:
            fcols = xs.shape[1]
            xs = jnp.concatenate(
                [xs, jnp.zeros((1, fcols), xs.dtype)])     # sentinel row N

        if use_fused:
            from pcgnn_tpu.ops.aggregate import batch_record_window
            rec = batch_record_window(graph, batch)        # [B, W] one DMA/row

        if train:
            # candidate ordering is relation-independent: sort once, keep the
            # static-max compact window (RelGraph.ksample_max bounds any
            # relation's int(ksample*rho) request)
            m_max = self.minor_window(int(train_pos.shape[0]),
                                      graph.relations)
            if score_from_window:
                tp_rows_f = (train_pos_feats if train_pos_feats is not None
                             else x[train_pos])
                tp_s0 = window_s0(sel_round(tp_rows_f))    # [P]
            else:
                tp_s0 = s0_sg[train_pos]
            (cand_ids, cand_valid, cand_dist,
             cand_slots) = oversample_candidates_values(
                center_s0, tp_s0, train_pos, train_pos_valid, m_max)
            minor_ctx = None
            if any_hub:
                # hub rows' minor requests can reach the whole candidate
                # pool (m = int(ceil(thr*deg)*rho), src/layers.py:681), so
                # they bypass the compact window: the hub lane selects them
                # exactly over the score-SORTED candidate table
                # (ops.hub.chunk_minor_band — dense-oracle tie rule)
                if not score_from_window:
                    tp_rows_f = (train_pos_feats
                                 if train_pos_feats is not None
                                 else x[train_pos])
                spv = jnp.where(train_pos_valid, tp_s0, _INF)
                slot = jnp.arange(spv.shape[0], dtype=jnp.int32)
                sp_sorted, slot_sorted = jax.lax.sort((spv, slot),
                                                      num_keys=1)
                feats_sorted = jax.lax.stop_gradient(tp_rows_f)[slot_sorted]
                minor_ctx = (sp_sorted, slot_sorted, feats_sorted)

        rel_embs = []
        rel_sums = []   # per relation (num, cnt, pending keep_minor)
        for r, rel in enumerate(graph.relations):
            ksample_b = None
            use_ew = rel.ewin is not None and score_from_window
            if use_ew:
                # contiguous-DMA feature window; ids (nbr) are only needed
                # for the train-time minor dedup, via the cheap [B]-row
                # nbr2d gather.  Slots past a row's degree hold the next
                # node's run — masked by `valid` before any use.
                d_w = max(rel.window_width, 1)
                if use_pack:
                    mrow = jax.lax.bitcast_convert_type(
                        prow[:, meta_off + 4 * r: meta_off + 4 * r + 4],
                        jnp.int32)
                    deg_b, keff_b = mrow[:, 0], mrow[:, 1]
                    ksample_b, starts_b = mrow[:, 2], mrow[:, 3]
                    nbr = (jax.lax.bitcast_convert_type(
                        prow[:, nbr_offs[r]: nbr_offs[r] + d_w], jnp.int32)
                        if train else None)
                elif rel.meta is not None:
                    # ONE [B, 4] row gather for (deg, keff, ksample,
                    # estart) — each element gather pays a fixed dispatch
                    # cost on TPU, so four of them per relation dominated
                    # the selection stage
                    mrow = rel.meta[batch]
                    deg_b, keff_b = mrow[:, 0], mrow[:, 1]
                    ksample_b, starts_b = mrow[:, 2], mrow[:, 3]
                    nbr = rel.nbr2d[batch] if train else None
                else:
                    deg_b, keff_b = rel.deg[batch], rel.keff[batch]
                    starts_b = None
                    nbr = rel.nbr2d[batch] if train else None
                degs = jnp.minimum(deg_b, d_w)
                offs = jax.lax.broadcasted_iota(
                    jnp.int32, (batch.shape[0], d_w), 1)
                valid = offs < degs[:, None]
                from pcgnn_tpu.ops.aggregate import (batch_raw_window,
                                                     unpack_window)
                raw = (rec[:, graph.fused_off[r]: graph.fused_off[r + 1]]
                       if use_fused
                       else batch_raw_window(rel, batch, starts=starts_b))
                xw_feat = unpack_window(raw, d_w, f, rel.ewin_fs,
                                        rel.ewin_packed)
            else:
                nbr, valid = batch_neighbor_window(rel, batch,
                                                   allow_capped=True)
                deg_b, keff_b = rel.deg[batch], rel.keff[batch]
            if rel.has_hubs:
                is_hub = deg_b > rel.window_width
                valid = valid & ~is_hub[:, None]   # hubs leave the window lane
            if not use_ew:
                xw = xs[jnp.minimum(nbr, n - 1) if clamp_ids
                        else nbr]                          # [B, D, fcols] rows
                xw_feat = xw[..., :f]
            # choose: SDDMM distance on score channel 0 + exact ranks
            # (src/layers.py:655-672; keff folds keep-all-when-small)
            # packed-store windows already hold bf16 values, so sel_round is
            # a value no-op there; it only actually rounds rows gathered
            # from the exact table (store-less relations at stress scale)
            nbr_s0 = (window_s0(sel_round(xw_feat)) if score_from_window
                      else xw[..., s0_col])
            d = jnp.abs(center_s0[:, None] - nbr_s0)
            d = jnp.where(valid, d, _INF)
            keep = keep_nearest(d, keff_b, valid)
            num, cnt = window_sum_from_gathered(xw_feat, keep)
            if rel.has_hubs:
                h_num, h_cnt = hub_choose_sum(
                    rel, batch, is_hub, xs, f, center_s0,
                    s0_col=s0_col, w0=w0, b0=b0, round_sel=packed_sel,
                    tp_col=tp_col if train else None,
                    minor_ctx=minor_ctx if train else None,
                    batch_labels=batch_labels if train else None,
                    rho=self.rho)
                num = jnp.where(is_hub[:, None], h_num, num)
                cnt = jnp.where(is_hub, h_cnt, cnt)
            keep_minor = None
            if train:
                keep_minor = oversample_keep(
                    rel, batch, batch_labels, cand_valid, self.rho,
                    ksample_b=ksample_b)
                if rel.has_hubs:
                    # hub rows' minors (selection + sum + duplicate
                    # subtraction) are handled entirely inside the hub
                    # lane — the compact window is too narrow for them
                    keep_minor = keep_minor & ~is_hub[:, None]
                # hub rows' window keep is empty, so this exact dedup is a
                # no-op for them
                keep_minor = dedup_minor_keep(nbr, keep, n, cand_ids,
                                              keep_minor)
                if not score_from_window:
                    m_num, m_cnt = minor_sum(xs, cand_ids, keep_minor, f)
                    num, cnt = num + m_num, cnt + m_cnt
                    keep_minor = None
            rel_sums.append((num, cnt, keep_minor))

        if train and score_from_window and graph.relations:
            # minor rows come from the COMPACT [P, F] tp table (the
            # full-node-table gather + its layout copies were ~156 us/step
            # at yelp scale), and the chunked feature gather — the
            # dominant, relation-INDEPENDENT cost — runs once for all
            # relations (minor_sum_compact_multi; ~3x on skew graphs
            # where M reaches the candidate-pool size)
            minors = minor_sum_compact_multi(
                tp_rows_f, cand_slots, [km for _, _, km in rel_sums])
            rel_sums = [(num + mn, cnt + mc, None)
                        for (num, cnt, _), (mn, mc) in zip(rel_sums, minors)]

        for r, (num, cnt, _) in enumerate(rel_sums):
            agg = num / jnp.maximum(cnt, 1.0)[:, None]
            cat = jnp.concatenate([self_feats, agg], axis=1)    # [B, 2F]
            h = jax.nn.relu(jnp.dot(cat, params["intra"][r]["w"],
                                    preferred_element_type=jnp.float32))
            rel_embs.append(h)

        cat_all = jnp.concatenate([self_feats] + rel_embs, axis=1)
        combined = jax.nn.relu(jnp.dot(cat_all, params["inter"]["w"],
                                       preferred_element_type=jnp.float32))
        gnn_logits = jnp.dot(combined, params["head"]["w"],
                             preferred_element_type=jnp.float32)
        return gnn_logits, center_scores

    def _forward_learned(
        self,
        params: dict,
        graph: MultiRelGraph,
        batch: jax.Array,
        batch_labels: Optional[jax.Array],
        *,
        train: bool,
        train_pos: Optional[jax.Array] = None,
        train_pos_valid: Optional[jax.Array] = None,
    ):
        """Learned-feature forward: the dense mask-GEMM lane.

        Same selection math as :meth:`forward` (choose + oversample,
        ``src/layers.py:633-738``, all stop-gradiented exactly as the
        reference's non-differentiable sampling), but aggregation builds
        the reference's dense 0/1 mask (``src/layers.py:594-624``) with
        ``scatter_batch_mask`` and contracts it on the MXU
        (``masked_mean_aggregate``): the VJP of ``mask @ X`` is
        ``mask^T @ g`` — a GEMM — so gradients flow into the trainable
        node table ``params['embed']``.  Duplicate minors collapse through
        the mask's set semantics (clamp to 1), reproducing the reference's
        Python-set union without an explicit dedup.
        """
        from pcgnn_tpu.ops.aggregate import (masked_mean_aggregate,
                                             scatter_batch_mask)

        if any(rel.has_hubs for rel in graph.relations):
            raise ValueError(
                "learn_features=True needs uncapped relations: the "
                "blockwise hub lane is frozen-feature by design "
                "(ops.hub stop-gradients its inputs).  Rebuild the graph "
                "with window_cap disabled (csr_from_edges(window_cap=dmax)) "
                "or train with frozen features.")
        x = params["embed"]
        n = graph.num_nodes
        clf = params["label_clf"]
        scores = jnp.dot(x, clf["w"], precision="highest",
                         preferred_element_type=jnp.float32) + clf["b"]
        center_scores = scores[batch]
        # selection is non-differentiable, exactly as in the frozen lane
        s0 = jax.lax.stop_gradient(scores[:, 0])
        s0_pad = jnp.concatenate([s0, jnp.full((1,), _INF, s0.dtype)])
        center_s0 = s0[batch]

        cand_ids = keep_minor_base = None
        if train:
            m_max = self.minor_window(int(train_pos.shape[0]),
                                      graph.relations)
            cand_ids, cand_valid, _, _ = oversample_candidates_values(
                center_s0, s0[train_pos], train_pos, train_pos_valid, m_max)

        self_feats = x[batch]
        rel_embs = []
        for r, rel in enumerate(graph.relations):
            nbr, valid = batch_neighbor_window(rel, batch)
            d = jnp.abs(center_s0[:, None] - s0_pad[nbr])
            d = jnp.where(valid, d, _INF)
            keep = keep_nearest(d, rel.keff[batch], valid)
            keep_minor = (oversample_keep(rel, batch, batch_labels,
                                          cand_valid, self.rho)
                          if train else None)
            mask = scatter_batch_mask(
                n, nbr, keep,
                cand_ids if train else None, keep_minor)
            agg = masked_mean_aggregate(mask, x)
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

    def to_prob(self, params, graph, batch, *, train: bool = False, **kw):
        """Sigmoid scores of both heads (``src/model.py:41-45``)."""
        gnn_logits, label_logits = self.forward(
            params, graph, batch, None, train=train, **kw)
        return jax.nn.sigmoid(gnn_logits), jax.nn.sigmoid(label_logits)

    def loss(
        self,
        params: dict,
        graph: MultiRelGraph,
        batch: jax.Array,
        batch_labels: jax.Array,
        batch_weight: Optional[jax.Array] = None,
        *,
        train_pos: jax.Array,
        train_pos_valid: jax.Array,
        train_pos_feats: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Joint loss L_gnn + alpha * L_simi (``src/model.py:47-62``).

        ``batch_weight`` masks padded batch slots (weighted-mean CE so a
        padded epoch-scan batch matches the reference's ragged last batch).
        """
        gnn_logits, center_scores = self.forward(
            params, graph, batch, batch_labels, train=True,
            train_pos=train_pos, train_pos_valid=train_pos_valid,
            train_pos_feats=train_pos_feats)
        ce_gnn = int_label_ce(gnn_logits, batch_labels)
        ce_label = int_label_ce(center_scores, batch_labels)
        if batch_weight is None:
            batch_weight = jnp.ones_like(ce_gnn)
        denom = jnp.maximum(jnp.sum(batch_weight), 1.0)
        gnn_loss = jnp.sum(ce_gnn * batch_weight) / denom
        label_loss = jnp.sum(ce_label * batch_weight) / denom
        return gnn_loss + self.alpha * label_loss
