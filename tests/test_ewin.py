"""Edge-window feature store: build correctness, gather parity, and
model-path equivalence with the scattered-gather lane.

The store (``graph.csr.attach_edge_windows``) pre-materializes the frozen
feature table in CSR edge order so each batch row's neighbor-feature window
is one contiguous block (``ops.pallas.window_gather``).  Every consumer
must produce EXACTLY the values of the legacy scattered path — the window
rows are copies of the same feature rows, contracted in the same order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
from pcgnn_tpu.graph.csr import attach_edge_windows, materialize_edge_windows
from pcgnn_tpu.models.gcn import GCN
from pcgnn_tpu.models.graphsage import GraphSage
from pcgnn_tpu.models.pcgnn import PCGNN
from pcgnn_tpu.ops import aggregate as agg
from pcgnn_tpu.ops import sddmm


@pytest.fixture(scope="module")
def graphs():
    g = synthetic_fraud_graph("small", seed=3)
    return g, materialize_edge_windows(g)


def test_store_layout(graphs):
    g, ge = graphs
    feats = np.asarray(g.features)
    for rel, rele in zip(g.relations, ge.relations):
        assert rele.ewin is not None and rele.estart is not None
        assert rele.ewin_dp % 1024 == 0
        assert rele.ewin_f == feats.shape[1]
        ewin = np.asarray(rele.ewin)
        estart = np.asarray(rele.estart)
        if rele.ewin_aligned:
            assert (estart % 1024 == 0).all()
        indptr = np.asarray(rel.indptr)
        col = np.asarray(rel.col)
        d = rel.window_width
        f = feats.shape[1]
        rng = np.random.default_rng(0)
        for v in rng.integers(0, rel.num_nodes, size=32):
            dc = min(int(np.asarray(rel.deg)[v]), d)
            got = ewin[estart[v]: estart[v] + dc * f].reshape(dc, f)
            want = feats[col[indptr[v]: indptr[v] + dc]]
            np.testing.assert_array_equal(got, want)


def test_batch_feature_window_matches_row_gather(graphs):
    g, ge = graphs
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.integers(0, g.num_nodes, size=64), jnp.int32)
    feats_pad = jnp.concatenate(
        [g.features, jnp.zeros((1, g.feat_dim), jnp.float32)])
    for rel in ge.relations:
        xw = np.asarray(agg.batch_feature_window(rel, batch, g.feat_dim))
        nbr, valid = agg.batch_neighbor_window(rel, batch)
        want = np.asarray(feats_pad[nbr])
        v = np.asarray(valid)
        # garbage beyond each row's degree is allowed (next node's run);
        # valid slots must match exactly
        np.testing.assert_array_equal(xw[v], want[v])


def test_feature_width_guard(graphs):
    _, ge = graphs
    batch = jnp.zeros((4,), jnp.int32)
    with pytest.raises(ValueError, match="feature width"):
        agg.batch_feature_window(ge.relations[0], batch, ge.feat_dim + 1)


def test_budget_fallback():
    g = synthetic_fraud_graph("tiny", seed=0)
    rel = attach_edge_windows(g.relations[0], np.asarray(g.features),
                              budget_bytes=16)
    assert rel.ewin is None  # unchanged, consumers fall back transparently


def test_pallas_interpret_matches_xla_fallback():
    from pcgnn_tpu.ops.pallas import window_gather as wg
    rng = np.random.default_rng(2)
    ewin = jnp.asarray(rng.standard_normal(64 * 1024).astype(np.float32))
    starts = jnp.asarray(
        (rng.integers(0, 60, size=16) * 1024).astype(np.int32))
    got = np.asarray(wg._gather(ewin, starts, 2048, interpret=True))
    want = np.asarray(jax.vmap(
        lambda s: jax.lax.dynamic_slice(ewin, (s,), (2048,)))(starts))
    np.testing.assert_array_equal(got, want)


def _pcgnn_setup(g):
    model = PCGNN(feat_dim=g.feat_dim, emb_dim=32,
                  num_relations=g.num_relations, alpha=2.0, rho=0.5)
    params = model.init(jax.random.key(0))
    labels = np.asarray(g.labels)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, g.num_nodes, size=128), jnp.int32)
    by = jnp.asarray(labels[np.asarray(batch)], jnp.int32)
    tp = jnp.asarray(np.flatnonzero(labels == 1)[:100], jnp.int32)
    tpv = jnp.ones(tp.shape, bool)
    return model, params, batch, by, tp, tpv


def test_pcgnn_forward_exact(graphs):
    g, ge = graphs
    model, params, batch, by, tp, tpv = _pcgnn_setup(g)
    for train in (True, False):
        a = model.forward(params, g, batch, by, train=train,
                          train_pos=tp, train_pos_valid=tpv)
        b = model.forward(params, ge, batch, by, train=train,
                          train_pos=tp, train_pos_valid=tpv)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_pcgnn_grads_close(graphs):
    g, ge = graphs
    model, params, batch, by, tp, tpv = _pcgnn_setup(g)

    def grads(g_):
        def loss(p):
            return model.loss(p, g_, batch, by, train_pos=tp,
                              train_pos_valid=tpv)
        return jax.value_and_grad(loss)(params)

    la, ga = grads(g)
    lb, gb = grads(ge)
    assert float(la) == float(lb)
    for xa, xb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   atol=5e-6, rtol=1e-5)


def test_pcgnn_hub_lane_exact():
    g = synthetic_fraud_graph("skew-tiny", seed=5)
    assert any(r.has_hubs for r in g.relations)
    ge = materialize_edge_windows(g)
    model, params, batch, by, tp, tpv = _pcgnn_setup(g)
    for train in (True, False):
        a = model.forward(params, g, batch, by, train=train,
                          train_pos=tp, train_pos_valid=tpv)
        b = model.forward(params, ge, batch, by, train=train,
                          train_pos=tp, train_pos_valid=tpv)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_baselines_exact(graphs):
    g, ge = graphs
    rng = np.random.default_rng(4)
    batch = jnp.asarray(rng.integers(0, g.num_nodes, size=96), jnp.int32)
    for cls, kw in [(GCN, {}), (GraphSage, {}),
                    (GraphSage, dict(num_sample=5))]:
        m = cls(feat_dim=g.feat_dim, emb_dim=16, **kw)
        p = m.init(jax.random.key(1))
        a, _ = m.forward(p, g, batch, train=False, key=jax.random.key(7))
        b, _ = m.forward(p, ge, batch, train=False, key=jax.random.key(7))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spmm_ewin_form(graphs):
    g, ge = graphs
    for rel in ge.relations:
        a = np.asarray(agg.segment_mean_spmm(rel, g.features))
        b = np.asarray(agg.segment_mean_spmm(rel, g.features,
                                             assume_ewin_features=True))
        np.testing.assert_array_equal(a, b)


def test_sddmm_ewin_form(graphs):
    g, ge = graphs
    rng = np.random.default_rng(6)
    w0 = jnp.asarray(rng.standard_normal(g.feat_dim).astype(np.float32))
    b0 = jnp.float32(0.25)
    s0 = jnp.dot(g.features, w0, precision="highest") + b0
    for rel in ge.relations:
        da, va = sddmm.edge_abs_diff_window(rel, s0)
        db, vb = sddmm.edge_abs_diff_window_ewin(rel, s0, w0, b0)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        v = np.asarray(va)
        # the ewin form contracts each window row with w0 independently,
        # the table form contracts [N, F] once — same math, last-ulp
        # differences scale with |s0|
        np.testing.assert_allclose(np.asarray(da)[v], np.asarray(db)[v],
                                   atol=1e-5)


def test_pcgnn_mixed_coverage_exact(monkeypatch):
    """Stress-scale graphs may materialize only SOME relations (per-relation
    HBM budget): on the score-from-window strategy the ewin and scattered
    lanes compute scores with the same contraction, so per-relation mixing
    must be exact."""
    import dataclasses

    import pcgnn_tpu.models.pcgnn as pcgnn_mod
    monkeypatch.setattr(pcgnn_mod, "SCORE_FROM_WINDOW_MIN_NODES", 0)
    g = synthetic_fraud_graph("small", seed=3)
    ge_full = materialize_edge_windows(g)
    # strip relation 1's store -> mixed coverage, no node_pack
    rels = list(ge_full.relations)
    rels[1] = dataclasses.replace(rels[1], ewin=None, estart=None,
                                  ewin_dp=0, ewin_f=0, meta=None)
    ge = dataclasses.replace(ge_full, relations=tuple(rels), node_pack=None)
    model, params, batch, by, tp, tpv = _pcgnn_setup(g)
    for train in (True, False):
        a = model.forward(params, g, batch, by, train=train,
                          train_pos=tp, train_pos_valid=tpv)
        b = model.forward(params, ge, batch, by, train=train,
                          train_pos=tp, train_pos_valid=tpv)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_unaligned_layout_exact():
    """When the 1024-aligned layout busts the HBM budget but exact packing
    fits, the store goes unaligned (shift kernel); values must not change."""
    import dataclasses

    g = synthetic_fraud_graph("small", seed=3)
    feats = np.asarray(g.features)
    rels = []
    for rel in g.relations:
        ra = attach_edge_windows(rel, feats)          # aligned (fits)
        assert ra.ewin_aligned
        # a budget below the aligned size forces the exact-packed fallback
        ru = attach_edge_windows(rel, feats,
                                 budget_bytes=int(ra.ewin.size) * 4 - 1)
        assert ru.ewin is not None and not ru.ewin_aligned
        rels.append(ru)
    ge = dataclasses.replace(materialize_edge_windows(g),
                             relations=tuple(rels), node_pack=None)
    assert all(not r.ewin_aligned for r in ge.relations)
    model, params, batch, by, tp, tpv = _pcgnn_setup(g)
    for train in (True, False):
        a = model.forward(params, g, batch, by, train=train,
                          train_pos=tp, train_pos_valid=tpv)
        b = model.forward(params, ge, batch, by, train=train,
                          train_pos=tp, train_pos_valid=tpv)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_shift_kernel_interpret_matches_xla_fallback():
    from pcgnn_tpu.ops.pallas import window_gather as wg
    rng = np.random.default_rng(3)
    ewin = jnp.asarray(rng.standard_normal(64 * 1024).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, 50_000, size=16).astype(np.int32))
    got = np.asarray(wg._gather_shift(ewin, starts, 2048, interpret=True))
    want = np.asarray(jax.vmap(
        lambda s: jax.lax.dynamic_slice(ewin, (s,), (2048,)))(starts))
    np.testing.assert_array_equal(got, want)


def _trainer_cfg(**over):
    cfg = dict(seed=7, data_name="synthetic:tiny", model="PCGNN",
               train_ratio=0.4, test_ratio=0.67, emb_size=16, lr=0.01,
               weight_decay=0.001, alpha=2.0, rho=0.5, epochs=2,
               valid_epochs=10 ** 9, batch_size=64, patience=10 ** 9,
               exp_num=0)
    cfg.update(over)
    return cfg


def test_trainer_end_to_end_matches():
    """A short training run with float32 edge windows on/off lands on
    identical losses (the pick/shuffle streams are seed-deterministic and
    the f32 step math is exact-equal)."""
    from pcgnn_tpu.train.trainer import Trainer
    losses = {}
    for ew in (True, False):
        t = Trainer(_trainer_cfg(edge_windows=ew, ewin_dtype="float32"))
        assert all((r.ewin is not None) == ew for r in t.graph.relations)
        params = t.model.init(jax.random.key(0))
        opt_state = t.tx.init(params)
        _, _, loss = t.epoch_block_fn(params, opt_state, 0, 2)
        losses[ew] = float(loss)
    assert losses[True] == losses[False]


def test_bf16_store_layout_and_values():
    """bfloat16 store (the trainer default): physically an f32 array of
    packed words with the standard kernel invariants, and gathered windows
    are EXACTLY bf16(features) upcast — the only rounding is the stored
    value."""
    g = synthetic_fraud_graph("small", seed=3)
    ge = materialize_edge_windows(g, dtype=jnp.bfloat16)
    feats = np.asarray(g.features)
    f = feats.shape[1]
    feats16 = np.asarray(
        jnp.asarray(feats).astype(jnp.bfloat16).astype(jnp.float32))
    feats16_pad = np.concatenate([feats16, np.zeros((1, f), np.float32)])
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.integers(0, g.num_nodes, size=64), jnp.int32)
    for rel in ge.relations:
        assert rel.ewin is not None and rel.ewin_packed
        assert rel.ewin.dtype == jnp.float32       # packed words
        assert rel.ewin_dp % 1024 == 0
        assert rel.ewin_fs % 2 == 0
        if rel.ewin_aligned:
            assert (np.asarray(rel.estart) % 1024 == 0).all()
        xw = np.asarray(agg.batch_feature_window(rel, batch, f))
        assert xw.dtype == np.float32 and xw.shape[2] == f
        nbr, valid = agg.batch_neighbor_window(rel, batch)
        want = feats16_pad[np.asarray(nbr)]
        v = np.asarray(valid)
        np.testing.assert_array_equal(xw[v], want[v])


def test_bf16_odd_feature_width_pads_to_pairs():
    """Odd feature widths round the STORED slot width up to even (whole f32
    pairs); the pad column is sliced back off by the consumer."""
    g = synthetic_fraud_graph("small", seed=3)
    feats = np.asarray(g.features)
    f_odd = feats.shape[1] - (1 - feats.shape[1] % 2)   # force odd
    feats_odd = feats[:, :f_odd]
    rel = attach_edge_windows(g.relations[0], feats_odd, dtype=jnp.bfloat16)
    assert rel.ewin_f == f_odd and rel.ewin_fs == f_odd + 1
    feats16 = np.asarray(
        jnp.asarray(feats_odd).astype(jnp.bfloat16).astype(jnp.float32))
    feats16_pad = np.concatenate(
        [feats16, np.zeros((1, f_odd), np.float32)])
    rng = np.random.default_rng(2)
    batch = jnp.asarray(rng.integers(0, g.num_nodes, size=48), jnp.int32)
    xw = np.asarray(agg.batch_feature_window(rel, batch, f_odd))
    nbr, valid = agg.batch_neighbor_window(rel, batch)
    v = np.asarray(valid)
    np.testing.assert_array_equal(xw[v], feats16_pad[np.asarray(nbr)][v])


def test_bf16_unaligned_layout_values():
    """bf16 + budget-forced exact packing (shift-kernel lane): starts stay
    even (whole f32 pairs) and gathered values are still exactly
    bf16(features)."""
    g = synthetic_fraud_graph("small", seed=3)
    feats = np.asarray(g.features)
    f = feats.shape[1]
    feats16 = np.asarray(
        jnp.asarray(feats).astype(jnp.bfloat16).astype(jnp.float32))
    feats16_pad = np.concatenate([feats16, np.zeros((1, f), np.float32)])
    rng = np.random.default_rng(3)
    batch = jnp.asarray(rng.integers(0, g.num_nodes, size=48), jnp.int32)
    for rel0 in g.relations:
        ra = attach_edge_windows(rel0, feats, dtype=jnp.bfloat16)
        ru = attach_edge_windows(rel0, feats, dtype=jnp.bfloat16,
                                 budget_bytes=int(ra.ewin.size) * 4 - 1)
        assert ru.ewin is not None and not ru.ewin_aligned
        xw = np.asarray(agg.batch_feature_window(ru, batch, f))
        nbr, valid = agg.batch_neighbor_window(ru, batch)
        v = np.asarray(valid)
        np.testing.assert_array_equal(xw[v], feats16_pad[np.asarray(nbr)][v])


def test_trainer_bf16_default_trains_close():
    """The trainer's default store dtype is bfloat16; training must stay
    healthy and land near the f32 run (only the frozen feature values
    round — accumulation and parameters stay f32)."""
    from pcgnn_tpu.train.trainer import Trainer
    losses = {}
    for dt in ("bfloat16", "float32"):
        t = Trainer(_trainer_cfg(ewin_dtype=dt) if dt != "bfloat16"
                    else _trainer_cfg())          # default path
        assert all(r.ewin is not None
                   and r.ewin_packed == (dt == "bfloat16")
                   for r in t.graph.relations)
        params = t.model.init(jax.random.key(0))
        opt_state = t.tx.init(params)
        _, _, loss = t.epoch_block_fn(params, opt_state, 0, 2)
        losses[dt] = float(loss)
    assert np.isfinite(losses["bfloat16"])
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=0.1)


def test_bf16_selection_symmetric_self_loop():
    """With a packed (bf16) store, ALL selection scores rank the
    bf16-rounded feature snapshot (models.pcgnn sel_round), so a
    self-loop's choose distance is exactly 0 and the self-loop wins any
    rounded-score tie.

    Construction: node v keeps exactly ONE neighbor (deg 3, threshold 0.1
    -> keff 1).  x[v] sits exactly on a bf16 rounding midpoint, and a
    LOWER-id neighbor's value is the other equidistant grid point — under
    the old asymmetric scoring (exact center vs rounded neighbors) the two
    distances tie and the earlier column (the neighbor) won; symmetric
    rounding makes the self distance exactly 0.  The forward output must
    therefore equal the same node's output in a graph whose only neighbor
    IS the self-loop.
    """
    from pcgnn_tpu.graph.csr import build_multirel, csr_from_edges

    n, v, a, b = 8, 5, 1, 2
    feats = np.asarray(
        [0.25, 1.0078125, 2.0, 0.5, 0.75, 1.00390625, 3.0, 4.0],
        np.float32)[:, None]
    # 1.00390625 = 1 + 2^-8: midpoint of the bf16 grid [1.0, 1.0078125]
    # (7 mantissa bits -> spacing 2^-7 at [1, 2)), round-to-nearest-even
    # -> 1.0; neighbor a holds the other grid point, so
    # |s_v - s~_a| == |s_v - s~_v| == 2^-8 under exact-center scoring and
    # the tie-break (lower column) used to pick the neighbor.
    assert float(jnp.asarray(feats[v, 0]).astype(jnp.bfloat16)) == 1.0
    assert float(jnp.asarray(feats[a, 0]).astype(jnp.bfloat16)) == 1.0078125

    def graph_for(edges):
        src, dst = map(np.asarray, zip(*edges))
        rel = csr_from_edges(src, dst, n, threshold=0.1)
        return materialize_edge_windows(
            build_multirel([rel], rel, feats, np.zeros(n, np.int64)),
            dtype=jnp.bfloat16)

    base = [(0, 3), (4, 6), (6, 7)]             # background edges
    g_tie = graph_for(base + [(v, a), (v, b)])  # v's nbrs: {a, b, v}
    g_self = graph_for(base)                    # v's nbrs: {v}
    assert int(np.asarray(g_tie.relations[0].keff)[v]) == 1
    assert g_tie.relations[0].ewin_packed

    model = PCGNN(feat_dim=1, emb_dim=8, num_relations=1, alpha=2.0, rho=0.5)
    params = model.init(jax.random.key(0))
    params["label_clf"]["w"] = jnp.asarray([[1.0, 0.0]])
    params["label_clf"]["b"] = jnp.zeros(2)
    batch = jnp.asarray([v], jnp.int32)

    out_tie, _ = model.forward(params, g_tie, batch, None, train=False)
    out_self, _ = model.forward(params, g_self, batch, None, train=False)
    np.testing.assert_array_equal(np.asarray(out_tie), np.asarray(out_self))


def test_trainer_bf16_default_auc_close():
    """AUC-level guard for the bf16 default (beyond the 2-epoch loss band):
    a short trained run under the bf16 store must land within a few AUC
    points of the f32 run on the validation split."""
    from pcgnn_tpu.train.metrics import evaluate
    from pcgnn_tpu.train.trainer import Trainer
    aucs = {}
    for dt in ("bfloat16", "float32"):
        t = Trainer(_trainer_cfg(ewin_dtype=dt, epochs=30, seed=11))
        params = t.model.init(jax.random.key(11))
        opt_state = t.tx.init(params)
        params, opt_state, _ = t.epoch_block_fn(params, opt_state, 0, 30)
        res = evaluate(lambda nodes: t.predict_fn(params, nodes),
                       t.idx_valid, t.y_valid, t.batch_size,
                       print_line=False)
        aucs[dt] = res.auc
    assert aucs["float32"] > 0.6          # the run actually learned
    assert abs(aucs["bfloat16"] - aucs["float32"]) < 0.05, aucs


def test_fused_record_store_exact():
    """The fused per-node record store (one DMA per batch row for ALL
    relations) is built by default and is value-identical to the
    per-relation stores and to the raw-graph forward."""
    g = synthetic_fraud_graph("small", seed=3)
    ge = materialize_edge_windows(g, dtype=jnp.bfloat16)
    gu = materialize_edge_windows(g, dtype=jnp.bfloat16, fused=False)
    assert ge.fused is not None and gu.fused is None
    assert len(ge.fused_off) == len(ge.relations) + 1
    assert ge.fused_w == ge.fused_off[-1]

    # record sections hold exactly the per-relation store runs (tight
    # 128-granule sections; compare each node's true packed-word run)
    fused = np.asarray(ge.fused)
    assert fused.shape[1] == ge.fused_w and fused.shape[0] >= g.num_nodes
    for r, rel in enumerate(ge.relations):
        ewin = np.asarray(rel.ewin)
        estart = np.asarray(rel.estart)
        o = ge.fused_off[r]
        fw = rel.ewin_fs // 2 if rel.ewin_packed else rel.ewin_f
        rng = np.random.default_rng(r)
        for v in rng.integers(0, g.num_nodes, size=16):
            run = min(int(np.asarray(rel.deg)[v]), rel.window_width) * fw
            np.testing.assert_array_equal(
                fused[v, o: o + run],
                ewin[estart[v]: estart[v] + run])

    model, params, batch, by, tp, tpv = _pcgnn_setup(g)
    for train in (True, False):
        a = model.forward(params, ge, batch, by, train=train,
                          train_pos=tp, train_pos_valid=tpv)
        b = model.forward(params, gu, batch, by, train=train,
                          train_pos=tp, train_pos_valid=tpv)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_fused_skipped_when_ineligible(monkeypatch):
    """No fused store without full aligned per-relation coverage (and the
    model then falls back to per-relation gathers transparently)."""
    from pcgnn_tpu.graph import csr as csr_mod

    g = synthetic_fraud_graph("small", seed=3)
    # force one relation over budget -> no store -> no fused
    monkeypatch.setattr(csr_mod, "EWIN_TOTAL_BUDGET_BYTES", 1)
    ge = materialize_edge_windows(g, total_budget_bytes=1)
    assert ge.fused is None
