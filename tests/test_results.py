"""ResultManager log <-> DataFrame round trips (reference
src/result_manager.py:48-157)."""

import numpy as np
import pandas as pd

from pcgnn_tpu.train.metrics import EvalResult
from pcgnn_tpu.train.results import ResultManager


def _res(seed: float) -> EvalResult:
    v = dict(accuracy=0.91 + seed, f1=0.52, f1_macro=0.71, precision=0.43,
             precision_macro=0.66, recall=0.68, recall_macro=0.74,
             auc=0.88, gmean=0.77)
    return EvalResult(**{k: round(x, 4) for k, x in v.items()},
                      predictions=np.zeros(4, np.int64),
                      anomaly_confidence=np.zeros(4, np.float32))


def _args(**kw):
    args = dict(model="PCGNN", data_name="yelp", seed=2, lr=0.01)
    args.update(kw)
    return args


def test_load_df_test_reparses_logs(tmp_path):
    root = str(tmp_path / "exp")
    r1 = ResultManager(_args(seed=2), root=root)
    r1.write_test_log(12, _res(0.0), print_line=False)
    r2 = ResultManager(_args(seed=3), root=root)
    r2.write_test_log(30, _res(0.01), print_line=False)

    # crash recovery: nuke the pickle, rebuild the cumulative test DF
    # purely from the .log files
    df_before = pd.read_pickle(r2.df_test_path)
    (tmp_path / "exp" / "test_df" / "PCGNN-yelp.pkl").unlink()
    r3 = ResultManager(_args(seed=5), root=root)
    df = r3.load_df_test()

    assert len(df) == 2
    assert set(df["exp_id"]) == {r1.exp_id, r2.exp_id}
    row1 = df[df["exp_id"] == r1.exp_id].iloc[0]
    assert row1["epoch_best"] == 12.0
    assert row1["accuracy"] == 0.91
    assert row1["auc"] == 0.88
    assert row1["precision_macro"] == 0.66
    assert row1["gmean"] == 0.77
    assert row1["seed"] == "2"          # config values re-parse as strings
    # metric columns agree with the incrementally-built DF
    for col in ("epoch_best", "accuracy", "f1", "f1_macro", "precision",
                "precision_macro", "recall", "recall_macro", "auc", "gmean"):
        got = df.sort_values("exp_id")[col].to_numpy(float)
        want = df_before.sort_values("exp_id")[col].to_numpy(float)
        np.testing.assert_allclose(got, want)

    # r3 crashed before its final test: header-only log is skipped
    assert r3.exp_id not in set(df["exp_id"])


def test_write_test_log_rebuilds_from_logs(tmp_path):
    # write_test_log survives a corrupted cumulative pickle because it
    # rebuilds from logs first (reference src/result_manager.py:119)
    root = str(tmp_path / "exp")
    r1 = ResultManager(_args(), root=root)
    r1.write_test_log(5, _res(0.0), print_line=False)
    # emulate a crash that lost the cumulative pickle between runs
    import os
    os.unlink(r1.df_test_path)
    r2 = ResultManager(_args(seed=7), root=root)
    r2.write_test_log(9, _res(0.01), print_line=False)
    df = pd.read_pickle(r2.df_test_path)
    assert len(df) == 2
    assert set(df["exp_id"]) == {r1.exp_id, r2.exp_id}
    assert r2.get_best_model_path("accuracy").endswith(f"{r2.exp_id}.ckpt")
