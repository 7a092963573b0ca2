"""Learned-feature (trainable embedding) lane: the dense mask-GEMM
aggregation path (``ops.aggregate.scatter_batch_mask`` +
``masked_mean_aggregate``) with gradients flowing into the node table —
the reference's ``nn.Embedding`` with requires_grad=True instead of the
frozen default (``model_handler.py:85-86``).  VERDICT r4 'Next round' #8.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
from pcgnn_tpu.models import build_model


def _setup(seed=0):
    g = synthetic_fraud_graph("tiny", seed=seed)
    model = build_model("PCGNN", feat_dim=g.feat_dim, emb_dim=16,
                        num_relations=3, alpha=2.0, rho=0.5,
                        learn_features=True)
    params = model.init(jax.random.key(seed), features=g.features)
    labels = np.asarray(g.labels)
    train_pos = np.flatnonzero(labels == 1)[:24]
    tp = jnp.asarray(train_pos, jnp.int32)
    tpv = jnp.ones(len(train_pos), bool)
    return g, model, params, labels, tp, tpv


def test_forward_matches_frozen_at_init():
    """At init the embed table equals the dataset features, so the learned
    lane's forward must equal the frozen window lane's (same selection +
    set semantics; the mask's clamp IS the dedup)."""
    g, model, params, labels, tp, tpv = _setup()
    frozen = build_model("PCGNN", feat_dim=g.feat_dim, emb_dim=16,
                         num_relations=3, alpha=2.0, rho=0.5)
    rng = np.random.default_rng(3)
    batch = jnp.asarray(rng.integers(0, g.num_nodes, 48), jnp.int32)
    y = jnp.asarray(labels[np.asarray(batch)], jnp.int32)
    l1, c1 = model.forward(params, g, batch, y, train=True,
                           train_pos=tp, train_pos_valid=tpv)
    l0, c0 = frozen.forward(
        {k: v for k, v in params.items() if k != "embed"}, g, batch, y,
        train=True, train_pos=tp, train_pos_valid=tpv)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=1e-4)


def test_gradients_reach_neighbor_only_rows():
    """The promise of the mask-GEMM lane: gradients reach embed rows that
    enter the loss ONLY as aggregated neighbors (not as batch centers, not
    as oversampled minors) — the window lane has no such path."""
    g, model, params, labels, tp, tpv = _setup()
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.integers(0, g.num_nodes, 32), jnp.int32)
    y = jnp.asarray(labels[np.asarray(batch)], jnp.int32)

    grads = jax.grad(lambda p: model.loss(
        p, g, batch, y, train_pos=tp, train_pos_valid=tpv))(params)
    ge = np.asarray(grads["embed"])
    assert np.isfinite(ge).all()
    batch_set = set(np.asarray(batch).tolist())
    tp_set = set(np.asarray(tp).tolist())
    # neighbor-only rows: adjacent to a batch node, not a center/minor
    nbr_only = set()
    for rel in g.relations:
        indptr, col = np.asarray(rel.indptr), np.asarray(rel.col)
        for v in batch_set:
            nbr_only.update(col[indptr[v]:indptr[v + 1]].tolist())
    nbr_only -= batch_set | tp_set
    rows = sorted(nbr_only)
    assert rows, "test graph degenerate"
    norms = np.abs(ge[rows]).sum(axis=1)
    assert (norms > 0).any(), "no gradient reached neighbor-only rows"


def test_learned_features_train_and_help():
    """End-to-end: with UNINFORMATIVE input features the frozen model is
    stuck at chance while the learned table lets the model fit the
    training labels — proving the embedding actually trains through the
    mask-GEMM lane."""
    g = synthetic_fraud_graph("tiny", seed=2)
    # destroy the feature signal: pure noise, labels unchanged
    rng = np.random.default_rng(0)
    noise = rng.normal(size=np.asarray(g.features).shape).astype(np.float32)
    g = dataclasses.replace(g, features=jnp.asarray(noise),
                            features_pad=None, node_pack=None)
    labels = np.asarray(g.labels)
    train_pos = np.flatnonzero(labels == 1)[:32]
    tp = jnp.asarray(train_pos, jnp.int32)
    tpv = jnp.ones(len(train_pos), bool)
    batch = jnp.asarray(rng.integers(0, g.num_nodes, 128), jnp.int32)
    y = jnp.asarray(labels[np.asarray(batch)], jnp.int32)

    def fit(learn):
        model = build_model("PCGNN", feat_dim=g.feat_dim, emb_dim=16,
                            num_relations=3, alpha=2.0, rho=0.5,
                            learn_features=learn)
        params = (model.init(jax.random.key(0), features=g.features)
                  if learn else model.init(jax.random.key(0)))
        tx = optax.adam(0.05)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            loss, grads = jax.value_and_grad(lambda p: model.loss(
                p, g, batch, y, train_pos=tp, train_pos_valid=tpv))(params)
            upd, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt, loss

        losses = []
        for _ in range(60):
            params, opt, loss = step(params, opt)
            losses.append(float(loss))
        return losses, params

    losses_l, params_l = fit(True)
    losses_f, _ = fit(False)
    # the learned table must move, and fit far better than frozen noise
    assert losses_l[-1] < 0.5 * losses_f[-1], (losses_l[-1], losses_f[-1])
    moved = np.abs(np.asarray(params_l["embed"]) - np.asarray(g.features))
    assert moved.max() > 1e-3


def test_learned_rejects_capped_relations():
    g = synthetic_fraud_graph("skew-tiny", seed=3)
    model = build_model("PCGNN", feat_dim=g.feat_dim, emb_dim=8,
                        num_relations=3, alpha=2.0, rho=0.5,
                        learn_features=True)
    params = model.init(jax.random.key(0), features=g.features)
    with pytest.raises(ValueError, match="hub"):
        model.forward(params, g, jnp.arange(8, dtype=jnp.int32),
                      jnp.zeros(8, jnp.int32), train=True,
                      train_pos=jnp.arange(4, dtype=jnp.int32),
                      train_pos_valid=jnp.ones(4, bool))


def test_trainer_learn_features_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from pcgnn_tpu.train.trainer import Trainer

    cfg = dict(seed=2, data_name="synthetic:tiny", model="PCGNN",
               train_ratio=0.4, test_ratio=0.67, emb_size=16, lr=0.01,
               weight_decay=0.001, alpha=2.0, rho=0.5, epochs=4,
               valid_epochs=2, batch_size=64, patience=100, exp_num=0,
               learn_features=True)
    t = Trainer(cfg)
    assert "embed" in t.model.init(jax.random.key(0),
                                   features=t.graph.features)
    auc, recall, f1 = t.train()
    assert np.isfinite([auc, recall, f1]).all()
