"""Result aggregation — the programmatic equivalent of the reference's
analysis notebooks (``performance_check.ipynb``, ``DataFrame.ipynb``):
mean±std of AUC / F1-macro / Recall over repeated seeds, grouped by
(model, data_name, train_ratio), read from the ``test_df`` pickles the
ResultManager accumulates.

Usage:
  python -m pcgnn_tpu.train.analysis [--results ./experimental_results]
"""

from __future__ import annotations

import argparse
import glob
import os

import pandas as pd

METRICS = ("auc", "f1_macro", "recall", "gmean")
GROUP_KEYS = ("model", "data_name", "train_ratio")


def load_all_test_dfs(results_dir: str = "./experimental_results") -> pd.DataFrame:
    paths = glob.glob(os.path.join(results_dir, "test_df", "*.pkl"))
    frames = [pd.read_pickle(p) for p in paths]
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def summarize(df: pd.DataFrame) -> pd.DataFrame:
    """Per-setting mean±std over seeds (performance_check.ipynb cell 2)."""
    if df.empty:
        return df
    keys = [k for k in GROUP_KEYS if k in df.columns]
    metrics = [m for m in METRICS if m in df.columns]
    agg = df.groupby(keys)[metrics].agg(["mean", "std", "count"])
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="./experimental_results")
    args = ap.parse_args()
    df = load_all_test_dfs(args.results)
    if df.empty:
        print("no test results found")
        return
    with pd.option_context("display.width", 160, "display.precision", 4):
        print(summarize(df))


if __name__ == "__main__":
    main()
