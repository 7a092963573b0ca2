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


def test_roofline_measure_cpu():
    """utils.roofline on the CPU backend: unknown chip -> absolute numbers
    only; timing and analytic accounting still work."""
    import jax
    import jax.numpy as jnp

    from pcgnn_tpu.utils import roofline

    bw, fl = roofline.chip_peaks(jax.devices()[0])
    assert bw is None and fl is None  # CPU: no peak table entry

    n = 256
    x = jnp.ones((n, n), jnp.float32)
    res = roofline.measure(jax.jit(lambda a: a @ a), x,
                           analytic_bytes=3 * n * n * 4,
                           analytic_flops=2 * n ** 3)
    assert res["wall_ms"] > 0
    assert res["achieved_gbps"] > 0
    assert res["flops"] == 2 * n ** 3
    assert res["mfu"] is None and res["peak_gbps"] is None
    assert "sol_frac" not in res  # needs a known peak


def test_pcgnn_step_streaming_bytes():
    from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
    from pcgnn_tpu.utils import roofline

    g = synthetic_fraud_graph("tiny", seed=0)
    b = roofline.pcgnn_step_streaming_bytes(g, 64, m_max=8, emb_dim=16)
    # must at least cover the per-relation window reads
    floor = sum(64 * max(int(r.window_width), 1) * (g.feat_dim + 1) * 4
                for r in g.relations)
    assert b >= floor
