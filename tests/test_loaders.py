"""Dataset loader tests against tiny fabricated reference-format files.

The reference trains from (a) PyG-style ``torch.save`` feature/label files
plus pickled ``defaultdict(set)`` adjacency lists (``src/utils.py:72-135``)
and (b) ``.mat`` files converted offline (``src/data_process.py``).  These
tests fabricate miniature files in those exact formats and load them through
the public ``load_data`` / ``convert_mat`` surface.
"""

import os
import pickle
from collections import defaultdict

import numpy as np
import pytest

from pcgnn_tpu.data.loaders import load_data, load_native, save_native


def _write_pickled_dataset(base, fpref, rel_sufs, pt_name, n=12, f=4, seed=0):
    """Fabricate a reference-format dataset directory."""
    import torch

    rng = np.random.default_rng(seed)
    os.makedirs(base, exist_ok=True)
    x = rng.random((n, f)).astype(np.float32)
    y = (rng.random(n) < 0.3).astype(np.int64)
    torch.save({"x": torch.from_numpy(x), "y": torch.from_numpy(y)},
               os.path.join(base, pt_name))

    adjs = {}
    for suf in ("homo",) + tuple(s for s in rel_sufs if s != "homo"):
        adj = defaultdict(set)
        for i in range(n):
            adj[i].add(i)  # reference files contain self-loops
            j = int(rng.integers(0, n))
            adj[i].add(j)
            adj[j].add(i)  # and are symmetric
        adjs[suf] = adj
        with open(os.path.join(base, f"{fpref}_{suf}_adjlists.pickle"),
                  "wb") as fh:
            pickle.dump(adj, fh)
    return x, y, adjs


@pytest.mark.parametrize("name,subdir,fpref,rel_sufs,pt_name", [
    ("yelp", "pyg/YelpChi/processed", "yelp", ("rur", "rtr", "rsr"),
     "YelpChi_data.pt"),
    ("tfinance", "pyg/TFinance/processed", "tfinance", ("homo",),
     "tfinance_data.pt"),
])
def test_load_pickled_reference_format(tmp_path, name, subdir, fpref,
                                       rel_sufs, pt_name):
    base = tmp_path / subdir
    x, y, adjs = _write_pickled_dataset(str(base), fpref, rel_sufs, pt_name)

    g = load_data(name, prefix=str(tmp_path) + "/")
    assert g.num_nodes == len(y)
    assert g.num_relations == len(rel_sufs)
    np.testing.assert_allclose(np.asarray(g.features), x)
    np.testing.assert_array_equal(np.asarray(g.labels), y)

    # CSR contents match the pickled adjacency sets exactly
    homo = g.homo
    indptr = np.asarray(homo.indptr)
    col = np.asarray(homo.col)
    for v in range(g.num_nodes):
        got = set(col[indptr[v]:indptr[v + 1]].tolist())
        assert got == {int(u) for u in adjs["homo"][v]}, f"row {v}"


def test_load_data_unknown_name():
    with pytest.raises(ValueError, match="unknown dataset"):
        load_data("nope")


def test_native_roundtrip(tmp_path):
    g = load_data("synthetic:tiny", seed=3)
    path = str(tmp_path / "g.npz")
    save_native(path, g)
    g2 = load_native(path)
    assert g2.num_nodes == g.num_nodes
    assert g2.num_relations == g.num_relations
    np.testing.assert_allclose(np.asarray(g2.features), np.asarray(g.features))
    np.testing.assert_array_equal(np.asarray(g2.labels), np.asarray(g.labels))
    for a, b in zip((*g.relations, g.homo), (*g2.relations, g2.homo)):
        np.testing.assert_array_equal(np.asarray(a.indptr), np.asarray(b.indptr))
        np.testing.assert_array_equal(np.asarray(a.col)[:a.num_edges],
                                      np.asarray(b.col)[:b.num_edges])
        np.testing.assert_array_equal(np.asarray(a.keff), np.asarray(b.keff))

    # load_data dispatches .npz paths to load_native
    g3 = load_data(path)
    np.testing.assert_array_equal(np.asarray(g3.labels), np.asarray(g.labels))


def test_convert_mat_pipeline(tmp_path):
    """Offline .mat conversion (reference src/data_process.py:12-49)."""
    import scipy.io
    import scipy.sparse as sp

    from pcgnn_tpu.data.process import convert_mat

    rng = np.random.default_rng(0)
    n, f = 10, 3
    feats = rng.random((n, f))
    label = (rng.random(n) < 0.4).astype(np.float64)

    def rand_adj():
        m = sp.random(n, n, density=0.3, random_state=1, format="csc")
        return (m + m.T).sign()

    mat = {"features": feats, "label": label.reshape(1, -1),
           "net_upu": rand_adj(), "net_usu": rand_adj(),
           "net_uvu": rand_adj(), "homo": rand_adj()}
    mat_path = str(tmp_path / "Amazon.mat")
    scipy.io.savemat(mat_path, mat)

    out_path = str(tmp_path / "amazon.npz")
    convert_mat(mat_path, out_path, dataset="amazon")
    g = load_data(out_path)
    assert g.num_nodes == n
    assert g.num_relations == 3
    # conversion adds self-loops (sparse_to_adjlist, src/utils.py:229)
    indptr = np.asarray(g.homo.indptr)
    col = np.asarray(g.homo.col)
    for v in range(n):
        assert v in set(col[indptr[v]:indptr[v + 1]].tolist())


def test_load_kdk_fabricated(tmp_path):
    """kdk branch (``src/utils.py:186-207``): 5 CSC .npz relation networks
    + homo + CSC features + labels, fabricated on disk."""
    import scipy.sparse as sp

    from pcgnn_tpu.data.loaders import load_data

    rng = np.random.default_rng(0)
    n, f = 64, 8
    gid = "007"
    (tmp_path / "attributes").mkdir()
    (tmp_path / "labels").mkdir()
    (tmp_path / "G0_Hetero").mkdir()
    (tmp_path / "G0_Homo").mkdir()

    feats = sp.csc_matrix(rng.normal(size=(n, f)).astype(np.float32))
    sp.save_npz(tmp_path / "attributes" / f"{gid}_node_feature(CSC).npz",
                feats)
    labels = (rng.random(n) < 0.2).astype(np.int64)
    np.save(tmp_path / "labels" / f"{gid}_label.npy", labels)

    net_types = ["_c_acc_c_network", "_c_clcare_c_network", "_c_fp_c_network",
                 "_c_hsdrcare_c_network", "_c_insr_c_network"]
    mats = []
    for t in net_types:
        m = sp.random(n, n, density=0.05, random_state=rng, format="csc")
        sp.save_npz(tmp_path / "G0_Hetero" / f"{gid}{t}(CSC).npz", m)
        mats.append(m)
    homo = sp.csc_matrix(sum(m.astype(bool).astype(np.int8) for m in mats))
    sp.save_npz(tmp_path / "G0_Homo" / f"{gid}_G0_Homo_network(CSC).npz",
                homo)

    g = load_data("kdk", str(tmp_path) + "/", graph_id=7)
    assert g.num_relations == 5
    assert g.num_nodes == n and g.feat_dim == f
    np.testing.assert_array_equal(np.asarray(g.labels), labels)
    np.testing.assert_allclose(np.asarray(g.features), feats.toarray(),
                               rtol=1e-6)
    # each relation carries the self-loop+symmetrize prep of the reference's
    # in-memory conversion (sparse_to_adjlist_for_train, src/utils.py:244)
    for rel, m in zip(g.relations, mats):
        want = (m.astype(bool) + m.T.astype(bool)
                + sp.eye(n, dtype=bool)).astype(bool)
        assert rel.num_edges == want.nnz
    assert not g.homo.is_stub


def test_load_data_per_relation_thresholds():
    from pcgnn_tpu.data.loaders import load_data

    thr = [0.3, 0.5, 0.7]
    g = load_data("synthetic:tiny", threshold=thr, seed=3)
    for t, rel in zip(thr, g.relations):
        deg = np.asarray(rel.deg)
        np.testing.assert_array_equal(np.asarray(rel.ksample),
                                      np.ceil(t * deg).astype(np.int32))


def test_verify_dataset_go_and_nogo(tmp_path):
    """data.verify: fabricated reference-format files pass the structural
    checks; a broken directory (missing file / asymmetric adjacency) is a
    loud NO-GO.  (Documented-stat rows only apply to the real datasets —
    tfinance has no expected-stats entry, exercising the structural path.)"""
    from pcgnn_tpu.data.verify import expected_files, verify_dataset

    base = tmp_path / "pyg/TFinance/processed"
    _write_pickled_dataset(str(base), "tfinance", ("homo",),
                           "tfinance_data.pt")
    ok, lines = verify_dataset("tfinance", str(tmp_path) + "/")
    assert ok, "\n".join(lines)

    # missing file -> NO-GO listing the path
    victim = expected_files("tfinance", str(tmp_path) + "/")[1]
    os.rename(victim, victim + ".bak")
    ok, lines = verify_dataset("tfinance", str(tmp_path) + "/")
    assert not ok and any("MISSING" in ln for ln in lines)
    os.rename(victim + ".bak", victim)

    # asymmetric adjacency -> NO-GO
    with open(victim, "rb") as fh:
        adj = pickle.load(fh)
    adj[0].add(len(adj) - 1)     # one-directional edge
    adj[len(adj) - 1].discard(0)
    with open(victim, "wb") as fh:
        pickle.dump(adj, fh)
    ok, lines = verify_dataset("tfinance", str(tmp_path) + "/")
    assert not ok and any("symmetric" in ln and "FAILED" in ln
                          for ln in lines)

    # unknown name -> NO-GO
    ok, _ = verify_dataset("nope", str(tmp_path) + "/")
    assert not ok


def test_verify_dataset_expected_stats(tmp_path):
    """A fabricated 'yelp' with the wrong node count trips the
    documented-statistics row."""
    from pcgnn_tpu.data.verify import verify_dataset

    base = tmp_path / "pyg/YelpChi/processed"
    _write_pickled_dataset(str(base), "yelp", ("rur", "rtr", "rsr"),
                           "YelpChi_data.pt", n=20, f=32)
    ok, lines = verify_dataset("yelp", str(tmp_path) + "/")
    assert not ok
    assert any("node count" in ln and "FAILED" in ln for ln in lines)
