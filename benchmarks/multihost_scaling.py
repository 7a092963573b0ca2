"""Multi-host scaling harness: the SPMD train step over 1 vs N local
processes coordinated by ``jax.distributed`` (('dcn', 'data', 'graph')
mesh, ``parallel.distributed``).

BASELINE.json's ladder is "edges/s scaling efficiency at 1 chip, 1 host,
N>=2 hosts (target >=80% 1 host -> 2 hosts)".  Without pod hardware this
runs each "host" as a local process with ``--xla_force_host_platform_
device_count`` virtual CPU devices — it validates the full multi-process
stack (coordinator, dcn-axis batch sharding, loss psum crossing process
boundaries) and reports *relative* weak-scaling numbers bounded by host
cores, not DCN-grade scaling.

Usage: python benchmarks/multihost_scaling.py [--procs 2]
       [--devices_per_proc 4] [--preset small] [--steps 8]
Prints one JSON line per process count and a summary with
``weak_scaling_eff`` (rows/s per process vs the 1-process run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pcgnn_tpu.utils.multiproc import (cpu_worker_env, gang_with_fresh_port,
                                       run_workers)

_WORKER = """
import json, os, sys, time
pid, nproc, port, out, preset, steps, bpd, dpp = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    sys.argv[5], int(sys.argv[6]), int(sys.argv[7]), int(sys.argv[8]))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={{dpp}}").strip()
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

from pcgnn_tpu.parallel.distributed import init_distributed, make_multihost_mesh
init_distributed(f"localhost:{{port}}", nproc, pid)

import jax.numpy as jnp
import numpy as np
from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
from pcgnn_tpu.models import build_model
from pcgnn_tpu.parallel.spmd import (
    make_spmd_train_step, pad_graph_for_mesh, shard_batch, shard_relations)
from pcgnn_tpu.train.trainer import torch_adam

mesh = make_multihost_mesh(graph=2)
g = synthetic_fraud_graph(preset, seed=2)
model = build_model("PCGNN", feat_dim=g.feat_dim, emb_dim=64,
                    num_relations=g.num_relations, alpha=2.0, rho=0.5)
params = model.init(jax.random.key(0))
labels = np.asarray(g.labels)
train_pos = np.flatnonzero(labels == 1)[:256]
tp = jnp.asarray(train_pos, jnp.int32)
tpv = jnp.ones(len(train_pos), bool)
tx = torch_adam(0.01, 0.001)

x_sharded, n_pad = pad_graph_for_mesh(g, mesh)
shards = shard_relations(g, mesh, n_pad)
step = make_spmd_train_step(model, mesh, tx, x_sharded, shards, n_pad)
opt_state = tx.init(params)

b = bpd * mesh.shape["dcn"] * mesh.shape["data"]
rng = np.random.default_rng(0)
batch = jnp.asarray(rng.integers(0, g.num_nodes, b), jnp.int32)
y = jnp.asarray(labels[np.asarray(batch)], jnp.int32)
w = jnp.ones((b,), jnp.float32)
batch, y, w = shard_batch(mesh, batch, y, w)

params, opt_state, loss = step(params, opt_state, batch, y, w, tp, tpv)
jax.block_until_ready(loss)     # CPU backend: reliable barrier
t0 = time.perf_counter()
for _ in range(steps):
    params, opt_state, loss = step(params, opt_state, batch, y, w, tp, tpv)
jax.block_until_ready(loss)
dt = (time.perf_counter() - t0) / steps
if pid == 0:
    with open(out, "w") as f:
        json.dump(dict(procs=nproc, batch=b, step_ms=dt * 1e3,
                       rows_per_s=b / dt, loss=float(loss)), f)
"""


def run_procs(nproc: int, args) -> dict:
    tmp = tempfile.mkdtemp()
    worker = os.path.join(tmp, "worker.py")
    with open(worker, "w") as f:
        f.write(_WORKER.format(repo=REPO))
    out = os.path.join(tmp, "result.json")
    gang_with_fresh_port(lambda port: run_workers(
        worker,
        [(pid, nproc, port, out, args.preset, args.steps,
          args.batch_per_data, args.devices_per_proc)
         for pid in range(nproc)],
        env=cpu_worker_env(), timeout=900))
    with open(out) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices_per_proc", type=int, default=4)
    ap.add_argument("--preset", default="small")
    ap.add_argument("--batch_per_data", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    ladder = []
    n = 1
    while n <= args.procs:
        ladder.append(n)
        n *= 2
    if ladder[-1] != args.procs:  # non-power-of-2: measure it too
        ladder.append(args.procs)
    # weak_scaling_eff is computed against the first (1-process) run BEFORE
    # each record is printed, so the streamed per-line records carry the
    # same fields as the final summary
    results = []
    base = None
    for n in ladder:
        rec = run_procs(n, args)
        if base is None:
            base = rec
        rec["weak_scaling_eff"] = round(
            (rec["rows_per_s"] / base["rows_per_s"])
            / (rec["batch"] / base["batch"]), 3)
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": [
        {k: r[k] for k in ("procs", "batch", "step_ms", "rows_per_s",
                           "weak_scaling_eff")} for r in results]}))


if __name__ == "__main__":
    main()
