"""Dataset preparation: splits, normalization, class partitioning.

Mirrors the reference's trainer-side preprocessing
(``src/model_handler.py:35-60`` and ``src/utils.py:213-271``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from sklearn.model_selection import train_test_split


def normalize_features(feats: np.ndarray) -> np.ndarray:
    """Row-normalize with the reference's +0.01 smoothing
    (``src/utils.py:213-223``); applied to amazon-family features
    (``src/model_handler.py:59-60``)."""
    feats = np.asarray(feats, dtype=np.float64)
    rowsum = feats.sum(axis=1) + 0.01
    r_inv = np.power(rowsum, -1.0)
    r_inv[np.isinf(r_inv)] = 0.0
    return (feats * r_inv[:, None]).astype(np.float32)


def stratified_splits(
    labels: np.ndarray,
    train_ratio: float,
    test_ratio: float,
    seed: int,
    num_unlabeled: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stratified train/valid/test index split.

    ``num_unlabeled`` leading node ids are excluded entirely (amazon keeps
    ids < 3305, amazon_new ids < 2013 out of every split,
    ``src/model_handler.py:38-43``).  ``test_ratio`` is the share of the
    *rest* (after the train split) that becomes test, exactly as the
    reference composes two ``train_test_split`` calls.

    Returns (idx_train, idx_valid, idx_test) as int64 arrays.
    """
    labels = np.asarray(labels)
    index = np.arange(num_unlabeled, len(labels))
    y = labels[num_unlabeled:]
    idx_train, idx_rest, y_train, y_rest = train_test_split(
        index, y, stratify=y, train_size=train_ratio,
        random_state=seed, shuffle=True)
    idx_valid, idx_test, _, _ = train_test_split(
        idx_rest, y_rest, stratify=y_rest, test_size=test_ratio,
        random_state=seed, shuffle=True)
    return (np.asarray(idx_train, dtype=np.int64),
            np.asarray(idx_valid, dtype=np.int64),
            np.asarray(idx_test, dtype=np.int64))


def pos_neg_split(idx: np.ndarray, y: np.ndarray):
    """Split node ids by label (``src/utils.py:256-271``)."""
    idx = np.asarray(idx)
    y = np.asarray(y)
    return idx[y == 1], idx[y == 0]
