"""Sharded-step overhead on ONE real chip (VERDICT r3 'Next round' #7).

Runs the SPMD (shard_map) training step on a degenerate 1x1
('data','graph') mesh next to the plain single-chip step, same graph and
batch, both as 16-step scanned programs (one dispatch; per-call submit
latency through a tunneled runtime would otherwise swamp the comparison).
The difference is the real cost of the shard_map program structure +
self-collectives — a number, not a guess.

Usage: python benchmarks/spmd_overhead.py [--preset yelp-like]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="yelp-like")
    ap.add_argument("--batch_size", type=int, default=1024)
    ap.add_argument("--nscan", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcgnn_tpu.train.trainer import Trainer, torch_adam
    from pcgnn_tpu.parallel.mesh import make_mesh
    from pcgnn_tpu.parallel.spmd import (pad_graph_for_mesh, shard_batch,
                                         shard_relations, spmd_loss_fn)
    from pcgnn_tpu.utils import roofline
    import optax

    cfg = dict(seed=2, data_name=f"synthetic:{args.preset}", model="PCGNN",
               train_ratio=0.4, test_ratio=0.67, emb_size=64, lr=0.01,
               weight_decay=0.001, alpha=2.0, rho=0.5, epochs=1,
               valid_epochs=10 ** 9, batch_size=args.batch_size,
               patience=10 ** 9, exp_num=0)
    t = Trainer(cfg)
    params = t.model.init(jax.random.key(0))
    opt_state = t.tx.init(params)
    rng = np.random.default_rng(0)
    batch = rng.choice(np.asarray(t.idx_train), args.batch_size)
    y = np.asarray(t.graph.labels)[batch]
    w = np.ones((args.batch_size,), np.float32)

    fn, fargs = t.single_step(params, opt_state, batch, y, w,
                              nscan=args.nscan)
    single_ms = roofline.timed_ms(lambda: fn(*fargs)) / args.nscan

    # SPMD on a 1x1 mesh, configured exactly as Trainer._build_steps does
    # for num_devices > 1: bf16 sharded edge-window store + the sharded
    # fused record table (one row gather fetches every relation's window —
    # without it the comparison charges the SPMD lane 3 per-relation DMA
    # gathers the product never issues, which inflated the r4 "+28%")
    mesh = make_mesh(data=1, graph=1, devices=jax.devices()[:1])
    x_sharded, n_pad = pad_graph_for_mesh(t.graph, mesh)
    shards = shard_relations(t.graph, mesh, n_pad, ewin_dtype=jnp.bfloat16)
    from pcgnn_tpu.parallel.spmd import build_sharded_fused
    fused, fused_off = build_sharded_fused(t.graph, shards, mesh, n_pad)
    loss_fn = spmd_loss_fn(t.model, mesh, n_pad, shards,
                           fused_off=fused_off)
    tx = torch_adam(cfg["lr"], cfg["weight_decay"])
    opt0 = tx.init(params)
    bj = jnp.asarray(batch, jnp.int32)
    yj = jnp.asarray(y, jnp.int32)
    wj = jnp.asarray(w, jnp.float32)
    bs, ys, ws = shard_batch(mesh, bj, yj, wj)
    tp, tpv = t.train_pos_dev, t.train_pos_valid

    @jax.jit
    def spmd_stepn(params, opt_state, x_sharded, shards, fused, bs, ys, ws,
                   tp, tpv):
        def body(carry, i):
            p, o = carry
            loss, grads = jax.value_and_grad(lambda q: loss_fn(
                q, x_sharded, shards, jnp.roll(bs, i), jnp.roll(ys, i),
                jnp.roll(ws, i), tp, tpv, fused))(p)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss
        (p, o), losses = jax.lax.scan(
            body, (params, opt_state),
            jnp.arange(args.nscan, dtype=jnp.int32))
        return p, o, losses[-1]

    spmd_ms = roofline.timed_ms(lambda: spmd_stepn(
        params, opt0, x_sharded, shards, fused, bs, ys, ws, tp,
        tpv)) / args.nscan

    print(json.dumps({
        "metric": "spmd_1x1_step_overhead",
        "preset": args.preset,
        "batch_size": args.batch_size,
        "single_chip_step_ms": round(single_ms, 3),
        "spmd_1x1_step_ms": round(spmd_ms, 3),
        "overhead_pct": round((spmd_ms / single_ms - 1) * 100, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
