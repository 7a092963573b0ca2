"""Sweep/fleet runner.

The reference launches independent runs over SSH onto free GPUs
(``exp_with_all_server.py``: paramiko + nvidia-smi polling + screen).  The
TPU-native equivalent is much simpler: experiments from a config directory
run as subprocesses, serialized per accelerator (one TPU chip = one job at a
time) or fanned out across hosts by an external scheduler.  Results land in
the shared ``experimental_results`` tree, so aggregation
(``train.analysis``) works unchanged.

Usage:
  python -m pcgnn_tpu.utils.fleet --config_dir experiment_configs [--jobs 1]
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time


def run_configs(config_dir: str, jobs: int = 1, python: str = sys.executable,
                dry_run: bool = False) -> int:
    paths = sorted(glob.glob(os.path.join(config_dir, "*.json")))
    if not paths:
        print(f"no configs found in {config_dir}")
        return 0
    print(f"{len(paths)} configs, {jobs} concurrent job(s)")
    active: list = []
    failures = 0
    for path in paths:
        while len(active) >= jobs:
            for p in list(active):
                if p.poll() is not None:
                    active.remove(p)
                    failures += p.returncode != 0
            time.sleep(0.5)
        cmd = [python, "-m", "pcgnn_tpu.cli", f"--exp_config_path={path}"]
        print("launch:", " ".join(cmd))
        if dry_run:
            continue
        active.append(subprocess.Popen(cmd))
    for p in active:
        p.wait()
        failures += p.returncode != 0
    print(f"done; {failures} failed")
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_dir", default="experiment_configs")
    ap.add_argument("--jobs", type=int, default=1)
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()
    sys.exit(1 if run_configs(args.config_dir, args.jobs,
                              dry_run=args.dry_run) else 0)


if __name__ == "__main__":
    main()
