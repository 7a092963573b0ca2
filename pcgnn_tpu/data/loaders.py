"""Dataset loading.

Covers the reference loader surface (``load_data``, ``src/utils.py:66-210``):
  * ``yelp`` / ``amazon`` / ``amazon_new`` — PyG ``*.pt`` feature/label files
    plus pickled ``defaultdict(set)`` adjacency lists (homo + 3 relations).
  * ``tfinance`` / ``elliptic`` / ``weibo`` — single homo relation.
  * ``kdk`` — five CSC ``.npz`` relation networks + homo, features from CSC.
  * ``synthetic:*`` — generated in-process (this framework's addition; the
    reference data files are external and not redistributed).
  * native ``.npz`` — this framework's own on-disk format
    (``save_native`` / ``load_native``).

Returned value is always a device-ready ``MultiRelGraph``.
"""

from __future__ import annotations

import os
import pickle
from typing import Sequence

import numpy as np

from pcgnn_tpu.graph.csr import (
    MultiRelGraph,
    build_multirel,
    csr_from_adj_dict,
    csr_from_scipy,
    rel_threshold,
)
from pcgnn_tpu.data.synthetic import synthetic_fraud_graph

# dataset name -> (subdir, file prefix, relation suffixes)
_PICKLED = {
    "yelp": ("pyg/YelpChi/processed", "yelp", ("rur", "rtr", "rsr"), "YelpChi_data.pt"),
    "amazon": ("pyg/AmazonFraud/processed", "amazon", ("upu", "usu", "uvu"),
               "AmazonFraud_data.pt"),
    "amazon_new": ("pyg/AmazonFraud/processed", "amazon_new", ("upu", "usu", "uvu"),
                   "AmazonFraud_new_data.pt"),
    "tfinance": ("pyg/TFinance/processed", "tfinance", ("homo",), "tfinance_data.pt"),
    "elliptic": ("pyg/Elliptic/processed", "elliptic", ("homo",), "elliptic_data.pt"),
    "weibo": ("pyg/Weibo/processed", "weibo", ("homo",), "weibo.pt"),
}

# number of leading unlabeled node ids per dataset (``src/model_handler.py:39``)
NUM_UNLABELED = {"amazon": 3305, "amazon_new": 2013}


def load_data(name: str, prefix: str = "data/",
              *, threshold: float | list = 0.5,
              graph_id=None, seed: int = 0) -> MultiRelGraph:
    """``threshold`` may be one float or a per-relation list (the
    reference's ``thresholds`` attribute, ``src/layers.py:52,193``)."""
    if name.startswith("synthetic"):
        preset = name.split(":", 1)[1] if ":" in name else "small"
        return synthetic_fraud_graph(preset, seed=seed, threshold=threshold)
    if name.endswith(".npz"):
        return load_native(name, threshold=threshold)
    if name in _PICKLED:
        return _load_pickled(name, prefix, threshold)
    if name == "kdk":
        return _load_kdk(prefix, graph_id, threshold)
    raise ValueError(f"unknown dataset {name!r}")


def _load_feats_labels(path: str, key_hints: Sequence[str]):
    """Read features/labels from a PyG-style ``torch.save`` file."""
    import torch  # CPU torch is available; only used for deserialization

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, (list, tuple)):
        obj = obj[0]
    for key in key_hints:
        try:
            store = obj[key] if key else obj
        except (KeyError, TypeError, IndexError):
            continue
        try:
            x, y = store["x"], store["y"]
        except (KeyError, TypeError, IndexError):
            try:
                x, y = store.x, store.y
            except AttributeError:
                continue
        return np.asarray(x, dtype=np.float32), np.asarray(y).astype(np.int64)
    raise ValueError(f"could not locate x/y in {path}")


def _load_pickled(name: str, prefix: str, threshold: float) -> MultiRelGraph:
    subdir, fpref, rel_sufs, pt_name = _PICKLED[name]
    base = os.path.join(prefix, subdir)
    feats, labels = _load_feats_labels(
        os.path.join(base, pt_name), ("review", "user", None))
    n = len(labels)

    def load_adj(suffix, thr):
        with open(os.path.join(base, f"{fpref}_{suffix}_adjlists.pickle"), "rb") as f:
            return csr_from_adj_dict(pickle.load(f), n, threshold=thr)

    homo = load_adj("homo", rel_threshold(threshold, None))
    rels = [homo if s == "homo" else load_adj(s, rel_threshold(threshold, r))
            for r, s in enumerate(rel_sufs)]
    return build_multirel(rels, homo, feats, labels)


def _load_kdk(prefix: str, graph_id, threshold: float) -> MultiRelGraph:
    """KDK: 5 CSC .npz relation networks + homo (``src/utils.py:186-207``)."""
    import scipy.sparse

    gid = str(graph_id).zfill(3)
    feats = scipy.sparse.load_npz(
        os.path.join(prefix, "attributes", f"{gid}_node_feature(CSC).npz")
    ).astype(np.float32).toarray()
    labels = np.load(os.path.join(prefix, "labels", f"{gid}_label.npy")).flatten()
    net_types = ["_c_acc_c_network", "_c_clcare_c_network", "_c_fp_c_network",
                 "_c_hsdrcare_c_network", "_c_insr_c_network"]
    rels = []
    for r, t in enumerate(net_types):
        mat = scipy.sparse.load_npz(
            os.path.join(prefix, "G0_Hetero", f"{gid}{t}(CSC).npz"))
        rels.append(csr_from_scipy(mat, threshold=rel_threshold(threshold, r)))
    homo = csr_from_scipy(
        scipy.sparse.load_npz(
            os.path.join(prefix, "G0_Homo", f"{gid}_G0_Homo_network(CSC).npz")),
        threshold=rel_threshold(threshold, None))
    return build_multirel(rels, homo, feats, labels.astype(np.int64))


# ---------------------------- native format ---------------------------- #

def save_native(path: str, graph: MultiRelGraph) -> None:
    """Serialize a MultiRelGraph to one .npz (edge lists + features/labels)."""
    arrays = {
        "features": np.asarray(graph.features),
        "labels": np.asarray(graph.labels),
        "num_relations": np.asarray(graph.num_relations),
    }
    for i, rel in enumerate([*graph.relations, graph.homo]):
        tag = f"rel{i}" if i < graph.num_relations else "homo"
        if rel.is_stub:
            raise ValueError(
                f"save_native: relation {tag!r} is a degree-only stub "
                "(graph.csr.degree_stub); serializing it would write 0 "
                "edges and silently change pick weights on reload.")
        e = rel.num_edges
        indptr = np.asarray(rel.indptr)
        arrays[f"{tag}_row"] = np.repeat(
            np.arange(rel.num_nodes), np.diff(indptr)).astype(np.int32)[:e]
        arrays[f"{tag}_col"] = np.asarray(rel.col)[:e]
    np.savez_compressed(path, **arrays)


def load_native(path: str, *, threshold: float = 0.5) -> MultiRelGraph:
    from pcgnn_tpu.graph.csr import csr_from_edges

    z = np.load(path)
    feats, labels = z["features"], z["labels"]
    n = len(labels)
    nrel = int(z["num_relations"])

    def mk(tag):
        return csr_from_edges(z[f"{tag}_row"], z[f"{tag}_col"], n,
                              threshold=threshold, add_self_loops=False,
                              symmetrize=False)

    rels = [mk(f"rel{i}") for i in range(nrel)]
    return build_multirel(rels, mk("homo"), feats, labels)
