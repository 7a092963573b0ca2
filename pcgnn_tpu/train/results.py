"""Experiment result management.

Equivalent of the reference ``ResultManager`` (``src/result_manager.py``):
the same on-disk tree under ``./experimental_results`` —
``validation_df/ test_df/ validation_log/ test_log/ saved_models/
predictions/`` — with config-headed ``.log`` files, cumulative pandas
DataFrames pickled per (model, dataset) pair, ``.npy`` predictions, and
best-model lookup by metric.  Checkpoints are JAX pytrees (see
``train.checkpoint``) instead of torch ``state_dict`` pickles.
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Optional

import numpy as np
import pandas as pd


class ResultManager:
    def __init__(self, args: dict, root: str = "./experimental_results"):
        self.root = root
        self.dirs = {
            "df_val": os.path.join(root, "validation_df"),
            "df_test": os.path.join(root, "test_df"),
            "log_val": os.path.join(root, "validation_log"),
            "log_test": os.path.join(root, "test_log"),
            "models": os.path.join(root, "saved_models"),
            "preds": os.path.join(root, "predictions"),
        }
        for d in self.dirs.values():
            os.makedirs(d, exist_ok=True)

        self.args = args
        model, data_name = args["model"], args["data_name"]
        self.exp_id = f"{model}-{data_name}-{datetime.now().strftime('%y%m%d-%H%M%S-%f')}"
        self.df_val_path = os.path.join(self.dirs["df_val"], f"{self.exp_id}.pkl")
        self.df_test_path = os.path.join(self.dirs["df_test"], f"{model}-{data_name}.pkl")
        self.log_val_path = os.path.join(self.dirs["log_val"], f"{self.exp_id}.log")
        self.log_test_path = os.path.join(self.dirs["log_test"], f"{self.exp_id}.log")
        self.model_path = os.path.join(self.dirs["models"], f"{self.exp_id}.ckpt")

        self.df_val = pd.DataFrame()
        self.df_test = (pd.read_pickle(self.df_test_path)
                        if os.path.exists(self.df_test_path) else pd.DataFrame())
        self._init_logs()

    def _config_lines(self) -> str:
        return "\n".join(f"{k}: {self.args[k]}" for k in sorted(self.args))

    def _init_logs(self):
        header = self._config_lines()
        for path in (self.log_val_path, self.log_test_path):
            with open(path, "a") as f:
                f.write(header + "\n")

    @staticmethod
    def _row(res) -> dict:
        return dict(accuracy=res.accuracy, f1=res.f1, f1_macro=res.f1_macro,
                    precision=res.precision, precision_macro=res.precision_macro,
                    recall=res.recall, recall_macro=res.recall_macro,
                    auc=res.auc, gmean=res.gmean)

    def write_val_log(self, epoch: int, epoch_best: int, res, print_line=True):
        line = f"[Epoch-{str(epoch).zfill(3)}] Validation performance\n{res.line}"
        with open(self.log_val_path, "a") as f:
            f.write(line + "\n")
        if print_line:
            print(line)
        idx = len(self.df_val)
        self.df_val.loc[idx, "epoch"] = epoch
        self.df_val.loc[idx, "epoch_best"] = epoch_best
        for k, v in self._row(res).items():
            self.df_val.loc[idx, k] = v
        self.df_val.to_pickle(self.df_val_path)

    # metric-line key -> DataFrame column (reference src/result_manager.py:63-71)
    _LOG_METRIC_COLS = (
        ("accuracy", "accuracy"), ("f1", "f1"), ("f1-macro", "f1_macro"),
        ("precision", "precision"), ("ap", "precision_macro"),
        ("recall", "recall"), ("recall-macro", "recall_macro"),
        ("auc-roc", "auc"), ("gmean", "gmean"),
    )

    def load_df_test(self) -> pd.DataFrame:
        """Rebuild the cumulative test DataFrame by re-parsing every test
        ``.log`` of this (model, data) pair — crash recovery of the results
        DB (reference ``src/result_manager.py:48-76``).  Logs whose run never
        reached the final test (no "Test performance" line) are skipped."""
        df = pd.DataFrame()
        pair = f"{self.args['model']}-{self.args['data_name']}"
        log_dir = self.dirs["log_test"]
        paths = [os.path.join(log_dir, name) for name in sorted(os.listdir(log_dir))
                 if pair in name]
        for path in paths:
            with open(path) as f:
                # the test line ends "\t\n" + the writer's own "\n", so the
                # last stripped element is the empty trailer — drop it
                lines = [ln.strip() for ln in f.readlines()][:-1]
            if not lines:
                continue
            result = lines.pop()
            if "Test performance" not in result:
                continue
            idx = len(df)
            df.loc[idx, "exp_id"] = os.path.basename(path)[:-4]
            metrics = dict(m.strip().split(": ", 1)
                           for m in result.split("- ")[1:] if ": " in m)
            metrics = {k.lower(): float(v) for k, v in metrics.items()}
            df.loc[idx, "epoch_best"] = metrics["epoch_best"]
            for key, col in self._LOG_METRIC_COLS:
                df.loc[idx, col] = metrics.get(key, float("nan"))
            cfg = dict(ln.split(": ", 1) for ln in lines if ": " in ln)
            for key in sorted(cfg):
                df.loc[idx, key] = cfg[key]
        df.to_pickle(self.df_test_path)
        self.df_test = df
        return df

    def write_test_log(self, epoch_best: int, res, print_line=True):
        # rebuild from logs first so the cumulative DF survives crashed or
        # concurrently-written pickles (reference src/result_manager.py:119)
        self.load_df_test()
        line = f"Test performance: - Epoch_Best: {epoch_best}\t" + res.line
        with open(self.log_test_path, "a") as f:
            f.write(line + "\n")
        if print_line:
            print(line)
        idx = len(self.df_test)
        self.df_test.loc[idx, "exp_id"] = self.exp_id
        self.df_test.loc[idx, "epoch_best"] = epoch_best
        for k, v in self._row(res).items():
            self.df_test.loc[idx, k] = v
        for k in sorted(self.args):
            # str() so live-appended rows share dtype with rows re-parsed
            # from .log files by load_df_test (which can only read strings)
            self.df_test.loc[idx, k] = str(self.args[k])
        self.df_test.to_pickle(self.df_test_path)

    def get_best_model_exp_id(self, metric: str = "auc") -> str:
        return self.df_test.iloc[self.df_test[metric].argmax()]["exp_id"]

    def get_best_model_path(self, metric: str = "auc") -> str:
        return os.path.join(self.dirs["models"],
                            f"{self.get_best_model_exp_id(metric)}.ckpt")

    def save_predictions(self, arr: np.ndarray, name: str) -> None:
        np.save(os.path.join(self.dirs["preds"], f"{self.exp_id}-{name}"), arr)
