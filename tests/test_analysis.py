"""Result-aggregation tests (the notebooks' mean±std protocol)."""

import numpy as np
import pandas as pd

from pcgnn_tpu.train.analysis import load_all_test_dfs, summarize


def _fake_df(model, data, train_ratio, aucs):
    rows = []
    for seed, auc in zip((2, 3, 5), aucs):
        rows.append(dict(exp_id=f"{model}-{data}-x{seed}", epoch_best=10,
                         auc=auc, f1_macro=auc - 0.1, recall=auc - 0.2,
                         gmean=auc - 0.15, model=model, data_name=data,
                         train_ratio=train_ratio, seed=seed))
    return pd.DataFrame(rows)


def test_summarize_mean_std_over_seeds(tmp_path):
    d = tmp_path / "test_df"
    d.mkdir()
    _fake_df("PCGNN", "yelp", 0.4, [0.90, 0.92, 0.94]).to_pickle(
        d / "PCGNN-yelp.pkl")
    _fake_df("GCN", "yelp", 0.4, [0.80, 0.80, 0.80]).to_pickle(
        d / "GCN-yelp.pkl")

    df = load_all_test_dfs(str(tmp_path))
    assert len(df) == 6
    agg = summarize(df)
    pc = agg.loc[("PCGNN", "yelp", 0.4)]
    np.testing.assert_allclose(pc[("auc", "mean")], 0.92)
    np.testing.assert_allclose(pc[("auc", "std")], np.std([0.90, 0.92, 0.94],
                                                          ddof=1))
    assert pc[("auc", "count")] == 3
    gc = agg.loc[("GCN", "yelp", 0.4)]
    np.testing.assert_allclose(gc[("auc", "std")], 0.0)


def test_summarize_empty(tmp_path):
    df = load_all_test_dfs(str(tmp_path))
    assert df.empty
    assert summarize(df).empty
