"""The reference's full verification protocol, end to end through the
product pipeline (VERDICT r4 'Next round' #6):

  utils.expgen   -> the 10-prime-seed config grid (epochs 1000, patience
                    100, per-dataset HP — generate_exp_config.ipynb cell 1)
  utils.fleet    -> serialized CLI runs (one TPU chip = one job at a time)
  train.analysis -> mean±std aggregation from the ResultManager test_df
                    pickles (performance_check.ipynb cell 2)

and writes the RESULTS.md quality table.  Datasets are the synthetic
reference-scale presets (the real YelpChi/Amazon files are not
redistributable).

Run: python benchmarks/quality_protocol.py [--workdir /tmp/r5_quality]
     [--datasets ...] [--seeds all|N] [--max_hours 4]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pcgnn_tpu.utils import expgen

DATASETS = ("synthetic:yelp-like", "synthetic:yelp-skew",
            "synthetic:amazon-like", "synthetic:amazon_new-like")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/r5_quality")
    ap.add_argument("--datasets", nargs="+", default=list(DATASETS))
    ap.add_argument("--seeds", default="all",
                    help="'all' = the 10 prime seeds, or a count prefix")
    ap.add_argument("--train_ratios", nargs="+", type=float, default=[0.4])
    ap.add_argument("--max_hours", type=float, default=4.0,
                    help="stop launching new runs past this wall budget; "
                    "completed runs still aggregate")
    ap.add_argument("--out", default=os.path.join(REPO, "RESULTS_QUALITY.md"))
    args = ap.parse_args()

    seeds = expgen.SEEDS if args.seeds == "all" else expgen.SEEDS[
        : int(args.seeds)]
    cfg_dir = os.path.join(args.workdir, "configs")
    os.makedirs(args.workdir, exist_ok=True)
    paths = expgen.generate(cfg_dir, datasets=args.datasets, seeds=seeds,
                            train_ratios=args.train_ratios)
    # seed-major order: if the wall budget cuts the sweep short, every
    # dataset still has the same number of completed seeds
    paths = [p for seed in seeds for p in paths
             if os.path.basename(p).endswith(f"seed{seed}.json")]
    print(f"{len(paths)} configs ({len(seeds)} seeds x "
          f"{len(args.datasets)} datasets x {len(args.train_ratios)} "
          f"ratios)", flush=True)

    # serialized CLI runs (fleet semantics, jobs=1 on the single chip),
    # under the wall budget; a persistent compilation cache makes every
    # same-shape run after the first skip its XLA compiles
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(args.workdir, "jax_cache"))
    # the CLI runs with cwd=workdir (ResultManager writes ./experimental_
    # results there); append — never replace — the axon PYTHONPATH
    env["PYTHONPATH"] = ":".join(
        p for p in (env.get("PYTHONPATH"), REPO) if p)
    deadline = time.time() + args.max_hours * 3600
    done = failed = skipped = 0
    for path in paths:
        if time.time() > deadline:
            skipped += 1
            continue
        cmd = [sys.executable, "-m", "pcgnn_tpu.cli",
               f"--exp_config_path={path}"]
        print("launch:", os.path.basename(path), flush=True)
        t0 = time.time()
        r = subprocess.run(cmd, cwd=args.workdir, env=env,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.STDOUT)
        print(f"  rc={r.returncode} ({time.time() - t0:.0f}s)", flush=True)
        done += r.returncode == 0
        failed += r.returncode != 0
    print(f"runs: {done} ok, {failed} failed, {skipped} skipped "
          f"(budget)", flush=True)

    # aggregate through train.analysis (the notebook-equivalent pipeline)
    from pcgnn_tpu.train.analysis import load_all_test_dfs, summarize
    res_dir = os.path.join(args.workdir, "experimental_results")
    df = load_all_test_dfs(res_dir)
    if df.empty:
        print("no results to aggregate")
        return
    agg = summarize(df)
    print(agg)

    lines = [
        "# RESULTS_QUALITY — the reference verification protocol at full "
        "strength",
        "",
        f"10-prime-seed grid (seeds {seeds}), epochs 1000 / patience 100 / "
        "valid every 10, per-dataset reference HP "
        "(`generate_exp_config.ipynb` cell 1), run through "
        "`utils.expgen` -> `utils.fleet` semantics -> `train.analysis` "
        "on a single TPU chip.  Synthetic reference-scale presets (the "
        "real YelpChi/Amazon files are not redistributable).",
        "",
        "| data | model | train_ratio | seeds | AUC | F1-macro | Recall |",
        "|---|---|---|---|---|---|---|",
    ]
    for key, row in agg.iterrows():
        model, data_name, train_ratio = key  # analysis.GROUP_KEYS order

        def ms(metric):
            m, s = row[(metric, "mean")], row[(metric, "std")]
            return f"{m:.4f}±{0.0 if s != s else s:.4f}"

        lines.append(
            f"| {data_name} | {model} | {train_ratio} "
            f"| {int(row[('auc', 'count')])} | {ms('auc')} "
            f"| {ms('f1_macro')} | {ms('recall')} |")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
