"""Checkpointing of params (+ optionally optimizer state) as pytrees.

The reference saves ``model.state_dict()`` at every validation improvement
and restores it for the final test (``src/model_handler.py:165-176``).  Here
checkpoints are host numpy pytrees written atomically; unlike the reference,
optimizer state can be included, enabling true resume.
"""

from __future__ import annotations

import os
import pickle
import tempfile

import jax
import numpy as np


def save_checkpoint(path: str, tree) -> None:
    host_tree = jax.tree.map(lambda x: np.asarray(x), tree)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(host_tree, f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
