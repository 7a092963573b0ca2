"""Measure the throughput of the reference implementation's algorithmic hot
path on this host, to calibrate ``bench.py``'s ``vs_baseline``.

The reference trains via per-batch Python-set neighbor unions, per-node
torch.sort choose filtering, and host-built dense masks
(``src/layers.py:207-291,633-738``).  This script re-executes that algorithm
(torch tensors for the GEMMs, Python loops for selection — the same
structure; fresh code, not copied) on the same synthetic YelpChi-scale graph
bench.py uses, times one epoch of forward+backward, and records
edges/s into BASELINE_MEASURED.json.

Run once: ``python benchmarks/measure_reference.py``
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pcgnn_tpu.data.prep import stratified_splits, pos_neg_split
from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
from pcgnn_tpu.sampling.pick import pick_probs


def adjacency_lists(rel):
    indptr = np.asarray(rel.indptr)
    col = np.asarray(rel.col)
    return [col[indptr[v]:indptr[v + 1]].tolist() for v in range(rel.num_nodes)]


def reference_style_batch(x, adj_lists, params, batch, labels, train_pos, rho=0.5):
    """One training batch in the reference's algorithmic style; returns the
    loss (after backward) and the number of candidate edges examined."""
    feat = torch.from_numpy(x)
    clf_w, clf_b = params["clf_w"], params["clf_b"]
    scores = feat @ clf_w + clf_b
    s0 = scores[:, 0]
    edges = 0

    rel_embs = []
    for r, adj in enumerate(adj_lists):
        samp_neighs = []
        for i, v in enumerate(batch):
            neighs = adj[v]
            edges += len(neighs)
            num_sample = math.ceil(0.5 * len(neighs))
            d = torch.abs(s0[v] - s0[torch.tensor(neighs)])
            _, order = torch.sort(d)
            if len(neighs) > num_sample + 1:
                selected = [neighs[j] for j in order[:num_sample].tolist()]
            else:
                selected = list(neighs)
            if labels[i] == 1 and len(train_pos):
                m = int(num_sample * rho)
                dp = torch.abs(s0[v] - s0[torch.tensor(train_pos)])
                _, orderp = torch.sort(dp)
                selected.extend(train_pos[j] for j in orderp[:m].tolist())
            samp_neighs.append(set(selected))

        unique_nodes_list = list(set.union(*samp_neighs))
        unique_nodes = {n: i for i, n in enumerate(unique_nodes_list)}
        mask = torch.zeros(len(samp_neighs), len(unique_nodes))
        cols = [unique_nodes[n] for sn in samp_neighs for n in sn]
        rows = [i for i in range(len(samp_neighs)) for _ in samp_neighs[i]]
        mask[rows, cols] = 1
        mask = mask / mask.sum(1, keepdim=True)
        agg = mask @ feat[torch.tensor(unique_nodes_list)]
        cat = torch.cat([feat[torch.tensor(batch)], agg], dim=1)
        rel_embs.append(F.relu(cat @ params["intra"][r]))

    cat_all = torch.cat([feat[torch.tensor(batch)]] + rel_embs, dim=1)
    combined = F.relu(cat_all @ params["inter"])
    logits = combined @ params["head"]
    y = torch.tensor(labels, dtype=torch.long)
    loss = F.cross_entropy(logits, y) + 2.0 * F.cross_entropy(scores[torch.tensor(batch)], y)
    loss.backward()
    return float(loss), edges


def main(preset="yelp-like", batch_size=1024, emb=64, max_batches=4):
    g = synthetic_fraud_graph(preset, seed=2)
    x = np.asarray(g.features)
    labels = np.asarray(g.labels)
    idx_train, _, _ = stratified_splits(labels, 0.4, 0.67, seed=2)
    y_train = labels[idx_train]
    train_pos, _ = pos_neg_split(idx_train, y_train)
    adj_lists = [adjacency_lists(rel) for rel in g.relations]
    deg_train = np.asarray(g.homo.deg)[idx_train]
    w = np.asarray(pick_probs(
        torch.from_numpy(deg_train).numpy(), y_train))

    torch.manual_seed(0)
    f = x.shape[1]
    params = {
        "clf_w": torch.randn(f, 2, requires_grad=True),
        "clf_b": torch.zeros(2, requires_grad=True),
        "intra": [torch.randn(2 * f, emb, requires_grad=True) for _ in range(3)],
        "inter": torch.randn(f + 3 * emb, emb, requires_grad=True),
        "head": torch.randn(emb, 2, requires_grad=True),
    }

    rng = np.random.default_rng(0)
    sample_size = 2 * len(train_pos)
    sampled = rng.choice(idx_train, size=sample_size, p=w / w.sum())
    num_batches = min(max_batches, -(-sample_size // batch_size))

    total_edges, t0 = 0, time.perf_counter()
    for b in range(num_batches):
        batch = sampled[b * batch_size:(b + 1) * batch_size].tolist()
        loss, edges = reference_style_batch(
            x, adj_lists, params, batch, labels[batch], train_pos.tolist())
        total_edges += edges
    dt = time.perf_counter() - t0
    edges_per_s = total_edges / dt
    sec_per_epoch = dt / num_batches * (-(-sample_size // batch_size))

    out = {
        "reference_edges_per_s": edges_per_s,
        "reference_sec_per_epoch": sec_per_epoch,
        "preset": preset,
        "batch_size": batch_size,
        "num_batches_timed": num_batches,
        "host": "cpu (torch)",
        "note": "reference algorithm re-execution; see module docstring",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "BASELINE_MEASURED.json")
    with open(os.path.abspath(path), "w") as fjson:
        json.dump(out, fjson, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
