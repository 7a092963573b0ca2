"""Activation-level parity of the TPU PC-GNN against a numpy re-execution of
the reference math (SURVEY.md §4(b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
from pcgnn_tpu.models import build_model
from tests.oracle import pcgnn_forward_oracle, softmax_ce


@pytest.fixture(scope="module")
def setup():
    g = synthetic_fraud_graph("tiny", seed=3)
    model = build_model("PCGNN", feat_dim=g.feat_dim, emb_dim=16,
                        num_relations=3, alpha=2.0, rho=0.5)
    params = model.init(jax.random.key(7))
    labels = np.asarray(g.labels)
    rng = np.random.default_rng(5)
    train_pos = np.sort(rng.choice(np.flatnonzero(labels == 1), 20, replace=False))
    batch = rng.integers(0, g.num_nodes, 48).astype(np.int32)
    return g, model, params, labels, train_pos, batch


@pytest.mark.parametrize("train", [True, False])
def test_forward_parity(setup, train):
    g, model, params, labels, train_pos, batch = setup
    tp = jnp.asarray(train_pos, jnp.int32)
    tpv = jnp.ones(len(train_pos), bool)
    y = jnp.asarray(labels[batch])
    logits, center = model.forward(
        params, g, jnp.asarray(batch), y if train else None, train=train,
        train_pos=tp, train_pos_valid=tpv)
    o_logits, o_center = pcgnn_forward_oracle(
        jax.tree.map(np.asarray, params), np.asarray(g.features),
        list(g.relations), batch, labels[batch],
        train_pos if train else [], rho=0.5, train=train)
    np.testing.assert_allclose(np.asarray(center), o_center, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), o_logits, atol=1e-4)


def test_loss_parity(setup):
    g, model, params, labels, train_pos, batch = setup
    tp = jnp.asarray(train_pos, jnp.int32)
    tpv = jnp.ones(len(train_pos), bool)
    y = labels[batch]
    loss = model.loss(params, g, jnp.asarray(batch), jnp.asarray(y),
                      train_pos=tp, train_pos_valid=tpv)
    o_logits, o_center = pcgnn_forward_oracle(
        jax.tree.map(np.asarray, params), np.asarray(g.features),
        list(g.relations), batch, y, train_pos, rho=0.5, train=True)
    expect = softmax_ce(o_logits, y).mean() + 2.0 * softmax_ce(o_center, y).mean()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_batch_weight_masks_padding(setup):
    g, model, params, labels, train_pos, batch = setup
    tp = jnp.asarray(train_pos, jnp.int32)
    tpv = jnp.ones(len(train_pos), bool)
    y = jnp.asarray(labels[batch])
    full = model.loss(params, g, jnp.asarray(batch), y,
                      train_pos=tp, train_pos_valid=tpv)
    # same batch with 8 extra junk rows, weighted out
    batch2 = jnp.concatenate([jnp.asarray(batch), jnp.zeros(8, jnp.int32)])
    y2 = jnp.concatenate([y, jnp.ones(8, y.dtype)])
    w2 = jnp.concatenate([jnp.ones(len(batch)), jnp.zeros(8)])
    masked = model.loss(params, g, batch2, y2, w2,
                        train_pos=tp, train_pos_valid=tpv)
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-5)


def test_score_from_window_path_matches_table_path(monkeypatch):
    """The large-graph lazy scoring path (scores computed on gathered
    windows, O(B·D·F)/step) must agree with the small-graph score-table
    path (one [N,F]x[F,2] matmul) — same math, different evaluation
    order, so allclose rather than bitwise."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
    from pcgnn_tpu.models import pcgnn as pcgnn_mod
    from pcgnn_tpu.models import build_model

    g = synthetic_fraud_graph("tiny", seed=5)
    model = build_model("PCGNN", feat_dim=g.feat_dim, emb_dim=16,
                        num_relations=g.num_relations, alpha=2.0, rho=0.5)
    params = model.init(jax.random.key(0))
    labels = np.asarray(g.labels)
    tp = jnp.asarray(np.flatnonzero(labels == 1)[:16], jnp.int32)
    tpv = jnp.ones(tp.shape[0], bool)
    batch = jnp.asarray(np.arange(48), jnp.int32)
    y = jnp.asarray(labels[:48], jnp.int32)

    outs = {}
    for name, thresh in [("table", 10 ** 9), ("window", 1)]:
        monkeypatch.setattr(pcgnn_mod, "SCORE_FROM_WINDOW_MIN_NODES", thresh)
        logits, cs = model.forward(params, g, batch, y, train=True,
                                   train_pos=tp, train_pos_valid=tpv)
        outs[name] = (np.asarray(logits), np.asarray(cs))
    np.testing.assert_allclose(outs["table"][0], outs["window"][0],
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(outs["table"][1], outs["window"][1],
                               rtol=2e-5, atol=2e-6)
