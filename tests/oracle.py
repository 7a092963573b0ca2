"""Numpy re-execution of the reference PC-GNN math, used as the parity
oracle for activation-level tests (SURVEY.md §4).

This follows the reference *algorithm* — per-node loops over neighbor sets,
stable sorts on L1 score distances, set-union sampling, dense mask mean
aggregation (``src/layers.py:539-738``) — in plain numpy, independent of the
TPU implementation under test.
"""

from __future__ import annotations

import math

import numpy as np


def adjacency_sets(rel):
    """Neighbor id list per node from a RelGraph (host-side)."""
    indptr = np.asarray(rel.indptr)
    col = np.asarray(rel.col)
    return [col[indptr[v]:indptr[v + 1]].tolist() for v in range(rel.num_nodes)]


def label_scores(x, w, b):
    return x @ w + b


def choose_oracle(batch, labels, neigh_lists, s0, train_pos, rho,
                  threshold=0.5, train=True):
    """Returns a list of *sets* of selected neighbor ids per batch node,
    mirroring choose_step_neighs / choose_step_test."""
    out = []
    train_pos = list(train_pos)
    for i, v in enumerate(batch):
        neighs = neigh_lists[v]
        num_sample = math.ceil(threshold * len(neighs))
        d = np.abs(s0[v] - s0[neighs])
        order = np.argsort(d, kind="stable")
        if len(neighs) > num_sample + 1:
            selected = [neighs[j] for j in order[:num_sample]]
        else:
            selected = list(neighs)
        if train and labels[i] == 1 and train_pos:
            m = int(num_sample * rho)
            dp = np.abs(s0[v] - s0[train_pos])
            orderp = np.argsort(dp, kind="stable")
            selected.extend(train_pos[j] for j in orderp[:m])
        out.append(set(selected))
    return out


def intra_oracle(batch, samp_neighs, x, w_r):
    """Mean over the selected set, concat self, ReLU(· W_r)."""
    b = len(batch)
    agg = np.zeros((b, x.shape[1]), dtype=np.float64)
    for i, s in enumerate(samp_neighs):
        ids = sorted(s)
        agg[i] = x[ids].mean(axis=0) if ids else 0.0
    cat = np.concatenate([x[batch], agg], axis=1)
    return np.maximum(cat @ w_r, 0.0), agg


def pcgnn_forward_oracle(params, x, relations, batch, labels, train_pos, rho,
                         threshold=0.5, train=True):
    """Full PC-GNN forward: returns (gnn_logits, center_scores)."""
    clf = params["label_clf"]
    scores = label_scores(x, np.asarray(clf["w"]), np.asarray(clf["b"]))
    s0 = scores[:, 0]
    center_scores = scores[batch]

    rel_embs = []
    for r, rel in enumerate(relations):
        neigh_lists = adjacency_sets(rel)
        samp = choose_oracle(batch, labels, neigh_lists, s0, train_pos, rho,
                             threshold=threshold, train=train)
        h, _ = intra_oracle(batch, samp, x, np.asarray(params["intra"][r]["w"]))
        rel_embs.append(h)

    cat = np.concatenate([x[batch]] + rel_embs, axis=1)
    combined = np.maximum(cat @ np.asarray(params["inter"]["w"]), 0.0)
    logits = combined @ np.asarray(params["head"]["w"])
    return logits, center_scores


def softmax_ce(logits, labels):
    z = logits - logits.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    return -logp[np.arange(len(labels)), labels]
