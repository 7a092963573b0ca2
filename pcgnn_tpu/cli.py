"""Command-line entry point.

``python -m pcgnn_tpu.cli --exp_config_path=<cfg.json>`` runs one training
job (reference ``main.py:150-154``); list-valued config entries trigger a
multi-run sweep with mean±std aggregation (reference ``multi_run_main``,
``main.py:27-56``).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from pcgnn_tpu.train.trainer import Trainer
from pcgnn_tpu.utils.config import grid, load_config, print_config


def run_single(config: dict):
    print_config(config)
    trainer = Trainer(config)
    return trainer.train()


def run(config: dict):
    configs = grid(config)
    if len(configs) == 1:
        return run_single(configs[0])

    f1s, aucs, recalls = [], [], []
    for i, cnf in enumerate(configs):
        print(f"Running {i}:\n")
        t0 = time.time()
        auc, recall, f1 = run_single(cnf)
        aucs.append(auc)
        recalls.append(recall)
        f1s.append(f1)
        print(f"Running {i} done, elapsed time {time.time() - t0:.1f}s")

    def agg(xs):
        return float(np.mean(xs)), float(np.std(xs, ddof=1)) if len(xs) > 1 else 0.0

    print(f"AUC    {agg(aucs)[0]:.4f} ± {agg(aucs)[1]:.4f}")
    print(f"F1-mac {agg(f1s)[0]:.4f} ± {agg(f1s)[1]:.4f}")
    print(f"Recall {agg(recalls)[0]:.4f} ± {agg(recalls)[1]:.4f}")
    return aucs, recalls, f1s


def main():
    parser = argparse.ArgumentParser(prog="pcgnn_tpu")
    parser.add_argument("--exp_config_path", type=str,
                        default="./configs/pcgnn_synthetic.json")
    args = parser.parse_args()
    run(load_config(args.exp_config_path))


if __name__ == "__main__":
    main()
