"""Experiment configuration: schema defaults, validation, grid expansion.

The active reference config path is a JSON file passed as
``--exp_config_path`` (``main.py:86-90,150-154``) with the schema generated
by ``generate_exp_config.ipynb``; list-valued entries expand into a meshgrid
of runs (``main.py:107-144``).
"""

from __future__ import annotations

import itertools
import json
from typing import List

# reference schema + defaults (generate_exp_config.ipynb cell 2 and the
# legacy argparse defaults at main.py:62-84)
DEFAULTS = {
    "seed": 72,
    "data_name": "amazon",
    "model": "PCGNN",
    "train_ratio": 0.4,
    "test_ratio": 0.67,
    "emb_size": 64,
    "lr": 0.01,
    "weight_decay": 0.001,
    "alpha": 2.0,
    "rho": 0.5,
    "epochs": 1000,
    "valid_epochs": 10,
    "batch_size": 1024,
    "patience": 100,
    "exp_num": 0,
    # pcgnn_tpu additions
    "data_prefix": "data/",
    "threshold": 0.5,
    # per-relation choose thresholds (reference ``self.thresholds``,
    # src/layers.py:52,193); a list here does NOT grid-expand (grid()
    # skips it) — it overrides the scalar "threshold" when set
    "thresholds": None,
    "graph_id": None,
    "num_devices": 1,
    # optional 'graph' axis size of the ('data','graph') mesh; default
    # factorization is parallel.mesh.factor_mesh(num_devices)
    "mesh_graph": None,
    # edge-materialized feature windows (graph.csr.attach_edge_windows):
    # one contiguous DMA per neighbor window instead of a scattered row
    # gather.  Auto-disabled per relation over the HBM budget and under
    # SPMD (num_devices > 1).
    "edge_windows": True,
    # store dtype: "bfloat16" (default; halves the gather-bound step's HBM
    # traffic — only the frozen feature values round, accumulation stays
    # f32) or "float32" (bit-exact vs the scattered-gather path).
    "ewin_dtype": "bfloat16",
    # multi-host training: true -> jax.distributed init + the
    # ('dcn', 'data', 'graph') mesh (parallel.distributed).  Every process
    # runs the same `python -m pcgnn_tpu.cli` with the same config;
    # process identity comes from "process_id", the PCGNN_PROCESS_ID env
    # var, or (TPU pods) jax auto-detection.  "mesh_graph"/"mesh_data"
    # size the PER-PROCESS axes; the 'dcn' axis length is process_count.
    "distributed": False,
    "coordinator_address": None,   # None = auto-detect (TPU pods)
    "num_processes": None,
    "process_id": None,
    "mesh_data": None,
    # PCGNN learned-feature variant: the node table trains as a parameter
    # (nn.Embedding with requires_grad=True) through the dense mask-GEMM
    # aggregation lane (ops.aggregate.scatter_batch_mask +
    # masked_mean_aggregate).  Needs uncapped relations; disables the
    # frozen-feature edge-window stores.
    "learn_features": False,
    # model-selection protocol: "gain" = the reference's relative AUC+F1
    # gain rule on argmax predictions (model_handler.py:162-169); "f1" =
    # the (f1) variant — validation sweeps 100 thresholds for best F1,
    # the gain rule runs on the swept F1-macro, and the chosen threshold
    # transfers to the final test (model_handler(f1).py:142-178,
    # utils(f1).py:314-322).
    "select": "gain",
}

REQUIRED = ("data_name", "model")


def load_config(path: str) -> dict:
    """JSON (the reference's active format, ``main.py:86-90``) or YAML
    (``config/pcgnn_yelpchi.yml`` documented in the reference README:35 but
    gitignored there — supported here so those configs run as-is)."""
    with open(path) as f:
        if path.endswith((".yml", ".yaml")):
            import yaml
            cfg = yaml.safe_load(f)
        else:
            cfg = json.load(f)
    return with_defaults(cfg)


def with_defaults(cfg: dict) -> dict:
    out = dict(DEFAULTS)
    out.update(cfg)
    for key in REQUIRED:
        if out.get(key) is None:
            raise ValueError(f"config missing required key {key!r}")
    return out


# list-valued keys that are *values*, not sweep axes
_NO_GRID = {"thresholds"}


def grid(cfg: dict) -> List[dict]:
    """Expand list-valued entries into the cross product of configs
    (reference ``grid``, ``main.py:107-144``).  Keys in ``_NO_GRID``
    (per-relation lists) are passed through, not expanded."""
    listed = {k: v for k, v in cfg.items()
              if isinstance(v, list) and k not in _NO_GRID}
    if not listed:
        return [dict(cfg)]
    fixed = {k: v for k, v in cfg.items() if not isinstance(v, list)}
    keys = list(listed)
    out = []
    for combo in itertools.product(*(listed[k] for k in keys)):
        c = dict(fixed)
        c.update(dict(zip(keys, combo)))
        out.append(c)
    return out


def print_config(config: dict) -> str:
    """(``main.py:93-105``)"""
    print("**************** MODEL CONFIGURATION ****************")
    lines = ""
    for key in sorted(config.keys()):
        line = "{}{} -->   {}\n".format(key, " " * (24 - len(key)), config[key])
        lines += line
        print(line, end="")
    print("**************** MODEL CONFIGURATION ****************")
    return lines
