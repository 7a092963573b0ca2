"""Post-hoc evaluation tools — the ``eval.ipynb`` / ``model_handler(f1)``
workflow: reload a saved checkpoint, calibrate a decision threshold on the
validation split (``get_best_f1``), and re-test with the transferred
threshold (``src/utils(f1).py:280-332``; ``model_handler(f1).py:142-178``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcgnn_tpu.train.checkpoint import load_checkpoint
from pcgnn_tpu.train.metrics import evaluate, get_best_f1
from pcgnn_tpu.train.trainer import Trainer


def threshold_transfer_eval(trainer: Trainer,
                            checkpoint_path: Optional[str] = None):
    """Calibrate the anomaly threshold on validation, apply it to test.

    Returns (valid_result, test_result, threshold)."""
    if checkpoint_path is None:
        checkpoint_path = trainer.result.model_path
    params = jax.tree.map(jnp.asarray, load_checkpoint(checkpoint_path))

    predict = lambda nodes: trainer.predict_fn(params, nodes)  # noqa: E731
    val_res = evaluate(predict, trainer.idx_valid, trainer.y_valid,
                       trainer.batch_size, print_line=False)
    _, thresh = get_best_f1(trainer.y_valid, val_res.anomaly_confidence)
    test_res = evaluate(predict, trainer.idx_test, trainer.y_test,
                        trainer.batch_size, print_line=False,
                        valid_thresh=thresh)
    return val_res, test_res, thresh


def model_select(result_manager, metric: str = "auc") -> str:
    """Best checkpoint path for a (model, dataset) pair by test metric
    (``src/result_manager.py:140-154``)."""
    return result_manager.get_best_model_path(metric)
