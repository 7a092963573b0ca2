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


def test_grads_match_reference(setup):
    """Gradients of the joint loss match torch autograd on the actual
    reference model (VERDICT r1 'Next round' #6a)."""
    import jax
    import jax.numpy as jnp
    import torch

    g, model, params, ref, labels, batch, tp, tpv = setup
    y = labels[batch]

    for p_t in ref.parameters():
        if p_t.grad is not None:
            p_t.grad = None
    loss_t = ref.loss(batch.tolist(), torch.from_numpy(y).long(),
                      train_flag=True)
    loss_t.backward()

    grads = jax.grad(model.loss)(params, g, jnp.asarray(batch, jnp.int32),
                                 jnp.asarray(y), train_pos=tp,
                                 train_pos_valid=tpv)

    inter = ref.inter1
    pairs = [
        (grads["label_clf"]["w"], inter.label_clf.weight.grad.T),
        (grads["label_clf"]["b"], inter.label_clf.bias.grad),
        (grads["inter"]["w"], inter.weight.grad),
        (grads["head"]["w"], ref.weight.grad.T),
    ]
    intras = [inter.intra_agg1, inter.intra_agg2, inter.intra_agg3]
    for i, intra in enumerate(intras):
        pairs.append((grads["intra"][i]["w"], intra.weight.grad))
    for got, want in pairs:
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-3, atol=2e-5)
    for p_t in ref.parameters():
        p_t.grad = None


def test_adam_step_matches_reference(setup):
    """One optimizer step: ``torch_adam`` (optax chain) reproduces
    ``torch.optim.Adam(lr, weight_decay)`` exactly — including the L2 term
    added to the grad *before* the moment updates (VERDICT r1 #6b;
    ``src/model_handler.py:124``)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from pcgnn_tpu.train.trainer import torch_adam

    g, model, params, ref, labels, batch, tp, tpv = setup
    y = labels[batch]
    lr, wd = 0.05, 0.001

    # fresh torch params (don't disturb the shared fixture model)
    ref_params = [torch.nn.Parameter(p.detach().clone())
                  for p in ref.parameters() if p.requires_grad]
    opt_t = torch.optim.Adam(ref_params, lr=lr, weight_decay=wd)
    loss_t = ref.loss(batch.tolist(), torch.from_numpy(y).long(),
                      train_flag=True)
    src = [p for p in ref.parameters() if p.requires_grad]
    grads_t = torch.autograd.grad(loss_t, src)
    for p_t, g_t in zip(ref_params, grads_t):
        p_t.grad = g_t
    opt_t.step()

    tx = torch_adam(lr, wd)
    opt_state = tx.init(params)
    grads = jax.grad(model.loss)(params, g, jnp.asarray(batch, jnp.int32),
                                 jnp.asarray(y), train_pos=tp,
                                 train_pos_valid=tpv)
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)

    inter = ref.inter1
    order = {id(p): i for i, p in enumerate(src)}
    def stepped(p):
        return ref_params[order[id(p)]].detach().numpy()

    pairs = [
        (new["label_clf"]["w"], stepped(inter.label_clf.weight).T),
        (new["label_clf"]["b"], stepped(inter.label_clf.bias)),
        (new["inter"]["w"], stepped(inter.weight)),
        (new["head"]["w"], stepped(ref.weight).T),
    ]
    intras = [inter.intra_agg1, inter.intra_agg2, inter.intra_agg3]
    for i, intra in enumerate(intras):
        pairs.append((new["intra"][i]["w"], stepped(intra.weight)))
    for got, want in pairs:
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-6)


@pytest.mark.slow
def test_five_relation_forward_matches_interagg5():
    """R=5 parity against the reference ``InterAgg5``
    (``src/layers.py:16-158``) — the KDK 5-network variant the reference
    defines but never wires into its ModelHandler (VERDICT r1 #7)."""
    import jax
    import jax.numpy as jnp
    import torch

    from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
    from pcgnn_tpu.models import build_model
    from tests.oracle import adjacency_sets

    layers = _load_ref_module("ref_layers5", os.path.join(REF, "src/layers.py"))
    ref_model = _load_ref_module("ref_model5", os.path.join(REF, "src/model.py"))

    g = synthetic_fraud_graph(
        None, num_nodes=256, feat_dim=12, fraud_rate=0.2,
        edges_per_relation=(512, 768, 384, 640, 896), seed=9)
    assert g.num_relations == 5
    emb = 8
    model = build_model("PCGNN", feat_dim=g.feat_dim, emb_dim=emb,
                        num_relations=5, alpha=2.0, rho=0.5)
    params = model.init(jax.random.key(5))
    p = jax.tree.map(np.asarray, params)

    labels = np.asarray(g.labels)
    rng = np.random.default_rng(2)
    train_pos = rng.choice(np.flatnonzero(labels == 1), 12,
                           replace=False).tolist()

    feats_t = torch.nn.Embedding(g.num_nodes, g.feat_dim)
    feats_t.weight = torch.nn.Parameter(
        torch.from_numpy(np.asarray(g.features).copy()), requires_grad=False)
    adj_lists = [{v: set(ns) for v, ns in enumerate(adjacency_sets(rel))}
                 for rel in g.relations]
    intras = [layers.IntraAgg(feats_t, g.feat_dim, emb, train_pos, 0.5,
                              cuda=False) for _ in range(5)]
    inter = layers.InterAgg5(feats_t, g.feat_dim, emb, train_pos, adj_lists,
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
        rng.choice(np.flatnonzero(labels == 1), 12, replace=False),
        rng.choice(np.flatnonzero(labels == 0), 20, replace=False),
    ]).astype(np.int64)
    tp = jnp.asarray(np.asarray(train_pos), jnp.int32)
    tpv = jnp.ones(len(train_pos), bool)

    for train in (True, False):
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
