import numpy as np
from sklearn.metrics import confusion_matrix, f1_score

from pcgnn_tpu.train.metrics import (
    compute_metrics,
    conf_gmean,
    get_best_f1,
    prob2pred,
)


def test_prob2pred_threshold():
    p = np.array([0.1, 0.5, 0.9])
    assert prob2pred(p).tolist() == [0, 1, 1]
    assert prob2pred(p, 0.95).tolist() == [0, 0, 0]


def test_conf_gmean():
    y = np.array([0, 0, 1, 1, 1, 0])
    pred = np.array([0, 1, 1, 0, 1, 0])
    conf = confusion_matrix(y, pred)
    tpr, tnr = 2 / 3, 2 / 3
    np.testing.assert_allclose(conf_gmean(conf), (tpr * tnr) ** 0.5)


def test_compute_metrics_consistency():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 200)
    probs = rng.random((200, 2)).astype(np.float32)
    res = compute_metrics(y, probs)
    preds = probs.argmax(1)
    assert res.accuracy == (preds == y).mean()
    assert res.f1 == f1_score(y, preds)
    assert 0 <= res.auc <= 1
    assert res.anomaly_confidence.shape == (200,)


def test_get_best_f1_sweep():
    y = np.array([0, 0, 0, 1, 1])
    probs = np.array([0.1, 0.2, 0.3, 0.8, 0.9])
    best_f1, thresh = get_best_f1(y, probs)
    assert best_f1 == 1.0
    assert 0.3 < thresh < 0.8
