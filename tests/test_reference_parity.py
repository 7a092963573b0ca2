"""Execution-level parity against the actual reference implementation.

Loads the reference's ``src/layers.py`` / ``src/model.py`` (PyTorch, CPU,
``cuda=False``), installs identical weights in both frameworks, and compares
forward activations and losses on the same synthetic graph and batch.  The
reference's choose step contains no RNG, so train-mode forwards are
deterministic up to float summation order.

Skipped when the reference checkout is not present.
"""

import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference checkout not available")


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp
    import torch

    from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
    from pcgnn_tpu.models import build_model
    from tests.oracle import adjacency_sets

    layers = _load_ref_module("ref_layers", os.path.join(REF, "src/layers.py"))
    ref_model = _load_ref_module("ref_model", os.path.join(REF, "src/model.py"))

    g = synthetic_fraud_graph("tiny", seed=11)
    emb = 16
    model = build_model("PCGNN", feat_dim=g.feat_dim, emb_dim=emb,
                        num_relations=3, alpha=2.0, rho=0.5)
    params = model.init(jax.random.key(3))
    p = jax.tree.map(np.asarray, params)

    labels = np.asarray(g.labels)
    rng = np.random.default_rng(1)
    train_pos = rng.choice(np.flatnonzero(labels == 1), 16,
                           replace=False).tolist()

    # ---- build the reference model with the same weights ---------------- #
    torch.manual_seed(0)
    feats_t = torch.nn.Embedding(g.num_nodes, g.feat_dim)
    feats_t.weight = torch.nn.Parameter(
        torch.from_numpy(np.asarray(g.features)), requires_grad=False)
    adj_lists = [
        {v: set(ns) for v, ns in enumerate(adjacency_sets(rel))}
        for rel in g.relations
    ]
    intras = [layers.IntraAgg(feats_t, g.feat_dim, emb, train_pos, 0.5,
                              cuda=False) for _ in range(3)]
    inter = layers.InterAgg3(feats_t, g.feat_dim, emb, train_pos, adj_lists,
                             intras, cuda=False)
    ref = ref_model.PCALayer(2, inter, 2.0)

    with torch.no_grad():
        inter.label_clf.weight.copy_(torch.from_numpy(p["label_clf"]["w"].T))
        inter.label_clf.bias.copy_(torch.from_numpy(p["label_clf"]["b"]))
        inter.weight.copy_(torch.from_numpy(p["inter"]["w"]))
        for i, intra in enumerate(intras):
            intra.weight.copy_(torch.from_numpy(p["intra"][i]["w"]))
        ref.weight.copy_(torch.from_numpy(p["head"]["w"].T))

    batch = np.concatenate([
        rng.choice(np.flatnonzero(labels == 1), 16, replace=False),
        rng.choice(np.flatnonzero(labels == 0), 32, replace=False),
    ]).astype(np.int64)
    rng.shuffle(batch)
    tp = jnp.asarray(np.asarray(train_pos), jnp.int32)
    tpv = jnp.ones(len(train_pos), bool)
    return g, model, params, ref, labels, batch, tp, tpv


@pytest.mark.parametrize("train", [True, False])
def test_forward_logits_match_reference(setup, train):
    import jax.numpy as jnp
    import torch

    g, model, params, ref, labels, batch, tp, tpv = setup
    y_t = torch.from_numpy(labels[batch]).long()
    with torch.no_grad():
        ref_logits, ref_center = ref.forward(batch.tolist(), y_t,
                                             train_flag=train)
    logits, center = model.forward(
        params, g, jnp.asarray(batch, jnp.int32),
        jnp.asarray(labels[batch]) if train else None,
        train=train, train_pos=tp, train_pos_valid=tpv)
    np.testing.assert_allclose(np.asarray(center), ref_center.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=2e-4)


def test_loss_matches_reference(setup):
    import jax.numpy as jnp
    import torch

    g, model, params, ref, labels, batch, tp, tpv = setup
    y = labels[batch]
    with torch.no_grad():
        ref_loss = ref.loss(batch.tolist(), torch.from_numpy(y).long(),
                            train_flag=True)
    loss = model.loss(params, g, jnp.asarray(batch, jnp.int32),
                      jnp.asarray(y), train_pos=tp, train_pos_valid=tpv)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
