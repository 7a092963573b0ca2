"""Experiment-generation and fleet-runner tooling tests."""

import json
import os

from pcgnn_tpu.utils.expgen import generate
from pcgnn_tpu.utils.fleet import run_configs


def test_expgen_grid(tmp_path):
    paths = generate(str(tmp_path), datasets=("yelp", "amazon_new"),
                     seeds=[2, 3], train_ratios=[0.1, 0.4])
    assert len(paths) == 8
    cfg = json.load(open(paths[0]))
    # schema parity with generate_exp_config.ipynb cell 2
    for k in ("seed", "data_name", "model", "train_ratio", "test_ratio",
              "emb_size", "lr", "weight_decay", "alpha", "rho", "epochs",
              "valid_epochs", "batch_size", "patience", "exp_num"):
        assert k in cfg, k
    # per-dataset hyperparameters
    yelp = [json.load(open(p)) for p in paths if "yelp" in p]
    amzn = [json.load(open(p)) for p in paths if "amazon_new" in p]
    assert all(c["batch_size"] == 1024 and c["lr"] == 0.01 for c in yelp)
    assert all(c["batch_size"] == 256 and c["lr"] == 0.005 for c in amzn)
    assert sorted(c["exp_num"] for c in yelp + amzn) == list(range(8))


def test_fleet_dry_run(tmp_path, capsys):
    generate(str(tmp_path), datasets=("yelp",), seeds=[2], train_ratios=[0.4])
    failures = run_configs(str(tmp_path), jobs=2, dry_run=True)
    out = capsys.readouterr().out
    assert failures == 0
    assert "1 configs" in out
    assert "launch:" in out and "pcgnn_tpu.cli" in out


def test_fleet_empty_dir(tmp_path, capsys):
    assert run_configs(str(tmp_path)) == 0
    assert "no configs" in capsys.readouterr().out
