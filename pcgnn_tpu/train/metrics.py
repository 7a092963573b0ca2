"""Evaluation metrics.

Mirrors the reference's ``test`` (``src/utils.py:280-333``), its
threshold-sweep variant (``src/utils(f1).py:280-350``), ``conf_gmean``
(``src/utils.py:454-456``) and ``prob2pred`` (``src/utils.py:441-451``).
sklearn is used for the metric definitions themselves, exactly as the
reference does; the model forward runs batched on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    confusion_matrix,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
)


@dataclass
class EvalResult:
    accuracy: float
    f1: float
    f1_macro: float
    precision: float
    precision_macro: float
    recall: float
    recall_macro: float
    auc: float
    gmean: float
    predictions: np.ndarray        # argmax class per node
    anomaly_confidence: np.ndarray  # prob of class 1
    # decision threshold chosen by the validation F1 sweep (``sweep_thresh``
    # evaluation, the (f1) trainer variant); None outside that mode
    thresh: Optional[float] = None

    @property
    def line(self) -> str:
        return (f"- F1: {self.f1:.4f}\t- Recall: {self.recall:.4f}"
                f"\t- Precision: {self.precision:.4f}"
                f"\t- Accuracy: {self.accuracy:.4f}\t- AUC-ROC: {self.auc:.4f}"
                f"\t- F1-macro: {self.f1_macro:.4f}"
                f"\t- Recall-macro: {self.recall_macro:.4f}"
                f"\t- AP: {self.precision_macro:.4f}"
                f"\t- GMean: {self.gmean:.4f}\t\n")


def prob2pred(y_prob: np.ndarray, thres: float = 0.5) -> np.ndarray:
    return (np.asarray(y_prob) >= thres).astype(np.int32)


def conf_gmean(conf: np.ndarray) -> float:
    tn, fp, fn, tp = conf.ravel()
    denom = (tp + fn) * (tn + fp)
    return float((tp * tn / denom) ** 0.5) if denom else 0.0


def compute_metrics(labels: np.ndarray, probs: np.ndarray) -> EvalResult:
    """Metrics from class probabilities [M, 2] (sigmoid of both logits, as
    the reference's ``to_prob``)."""
    labels = np.asarray(labels)
    preds = probs.argmax(axis=1)
    anomaly = probs[:, 1]
    return EvalResult(
        accuracy=accuracy_score(labels, preds),
        f1=f1_score(labels, preds),
        f1_macro=f1_score(labels, preds, average="macro"),
        precision=precision_score(labels, preds, zero_division=0),
        precision_macro=precision_score(labels, preds, zero_division=0,
                                        average="macro"),
        recall=recall_score(labels, preds),
        recall_macro=recall_score(labels, preds, average="macro"),
        auc=roc_auc_score(labels, anomaly),
        gmean=conf_gmean(confusion_matrix(labels, preds)),
        predictions=preds,
        anomaly_confidence=anomaly,
    )


def get_best_f1(labels: np.ndarray, probs: np.ndarray) -> Tuple[float, float]:
    """Sweep 100 thresholds on the anomaly probability for best F1
    (``src/utils(f1).py:334-350``)."""
    labels = np.asarray(labels)
    best_f1, best_thresh = 0.0, 0.0
    for thresh in np.linspace(0.01, 0.99, 100):
        preds = (probs > thresh).astype(np.int64)
        f1 = f1_score(labels, preds)
        if f1 > best_f1:
            best_f1, best_thresh = f1, thresh
    return best_f1, best_thresh


def evaluate(
    predict_fn,
    nodes: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
    *,
    result=None,
    epoch: Optional[int] = None,
    epoch_best: Optional[int] = None,
    flag: Optional[str] = None,
    print_line: bool = True,
    valid_thresh: Optional[float] = None,
    sweep_thresh: bool = False,
) -> EvalResult:
    """Batched evaluation driver (reference ``test``).

    ``predict_fn(batch_ids[int32 B]) -> probs [B, 2]`` must be a jitted,
    fixed-batch forward; this driver pads the final batch.

    If ``valid_thresh`` is given, F1/F1-macro are recomputed at that
    threshold (threshold-transfer evaluation, ``src/utils(f1).py:314-322``).
    With ``sweep_thresh`` the 100-threshold F1 sweep runs instead (the
    (f1) validation protocol, ``src/utils(f1).py:314-318``): F1 is the
    best swept value, F1-macro is computed at the winning threshold, and
    ``result.thresh`` carries it for threshold transfer.  Both overrides
    happen BEFORE logging, so the logged line matches the reference's.
    """
    nodes = np.asarray(nodes)
    m = len(nodes)
    probs = np.empty((m, 2), dtype=np.float32)
    for start in range(0, m, batch_size):
        end = min(start + batch_size, m)
        batch = nodes[start:end]
        pad = batch_size - len(batch)
        if pad:
            batch = np.concatenate([batch, np.zeros(pad, batch.dtype)])
        out = np.asarray(predict_fn(batch.astype(np.int32)))
        probs[start:end] = out[: end - start]

    res = compute_metrics(labels, probs)
    if sweep_thresh:
        res.f1, res.thresh = get_best_f1(labels, probs[:, 1])
        preds = (probs[:, 1] > res.thresh).astype(np.int64)
        res.f1_macro = f1_score(labels, preds, average="macro")
        res.predictions = preds
    elif valid_thresh is not None:
        preds = (probs[:, 1] > valid_thresh).astype(np.int64)
        res.f1 = f1_score(labels, preds)
        res.f1_macro = f1_score(labels, preds, average="macro")
        res.predictions = preds

    if result is not None:
        if flag == "val":
            result.write_val_log(epoch, epoch_best, res, print_line)
        elif flag == "test":
            result.write_test_log(epoch_best, res, print_line)
    return res
