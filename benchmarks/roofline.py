"""Roofline benchmarks for the PC-GNN hot kernels.

Measures, on the current accelerator, each hot op's achieved HBM bandwidth
against the chip's peak via a speed-of-light fraction over hand-derived
minimum streaming traffic (``pcgnn_tpu.utils.roofline`` — see its module
docstring for the timing methodology and why XLA's "bytes accessed" is
reported only as informational).  The reference has no performance model at
all (SURVEY.md §6); BASELINE.json's bar is "benchmark SpMM/SDDMM at
speed-of-light per chip" — this is that benchmark.

Kernels:
  window_gather  — the [B, D] neighbor-window row gather xs[nbr], the
                   single hottest op of the training step.
  choose         — keep_nearest (one lax.sort + threshold pass) on [B, D].
  spmm           — segment_mean_spmm over the full largest relation.
  sddmm          — edge_abs_diff over the full largest relation.
  matmul_anchor  — 8192^3 bf16 matmul; validates the timing path against
                   the chip's known peak (expect MFU ~0.9).
  loss_fwd / loss_grad / train_step — stage ablation of one optimizer
                   step; train_step's sol_frac is the headline roofline
                   number bench.py also reports.

Usage: python benchmarks/roofline.py [--preset yelp-like] [--out FILE]
Prints one JSON line per kernel and writes --out if given.

Speed-of-light caveat: ``analytic_bytes`` gives no cache-reuse credit
(every gathered row counted as one HBM read), so sol_frac can exceed 1 on
small tables that fit in VMEM — that is the kernel beating the *streaming*
bound, not an accounting error.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def bench_relation_kernels(graph, batch_size: int):
    import jax
    import jax.numpy as jnp

    from pcgnn_tpu.ops.aggregate import (batch_neighbor_window, keep_nearest,
                                         segment_mean_spmm)
    from pcgnn_tpu.ops.sddmm import edge_abs_diff
    from pcgnn_tpu.utils import roofline

    rng = np.random.default_rng(0)
    n = graph.num_nodes
    f = graph.feat_dim
    batch = jnp.asarray(rng.integers(0, n, batch_size), jnp.int32)
    # production gathers features + the score column in ONE row gather
    xs = jnp.asarray(rng.standard_normal((n + 1, f + 1)), jnp.float32)
    rows = []

    # timing-path anchor with a known answer: big bf16 matmul ~ peak MFU
    m = 8192
    a = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)
    res = roofline.measure(jax.jit(lambda a: a @ a), a,
                           analytic_bytes=3 * m * m * 2,
                           analytic_flops=2 * m ** 3)
    rows.append({"kernel": "matmul_anchor", "shape": f"[{m},{m}] bf16",
                 **res})

    # largest relation = the representative hot one
    rel = max(graph.relations, key=lambda r: r.num_edges)
    nbr, valid = batch_neighbor_window(rel, batch, allow_capped=True)
    b, d = nbr.shape

    gather = jax.jit(lambda xs, nbr: xs[nbr])
    streaming = b * d * ((f + 1) * 4 * 2 + 4)  # row read + write + idx
    res = roofline.measure(gather, xs, nbr, analytic_bytes=streaming)
    rows.append({"kernel": "window_gather", "shape": f"[{b},{d},{f+1}]",
                 **res})

    if rel.ewin is not None:
        # per-relation store path: one contiguous DMA per batch row from
        # the edge-materialized store (ops.pallas.window_gather)
        from pcgnn_tpu.ops.aggregate import batch_feature_window
        bw = jax.jit(lambda rel, b_: batch_feature_window(rel, b_, f))
        res = roofline.measure(bw, rel, batch,
                               analytic_bytes=b * d * f * 4 * 2)
        rows.append({"kernel": "window_gather_ewin",
                     "shape": f"[{b},{d},{f}]", **res})

    if graph.fused is not None:
        # production path: ALL relations' windows in one row fetch per
        # batch node from the fused record table (graph.csr fused store)
        fr = jax.jit(lambda t2d, b_: t2d[b_])
        res = roofline.measure(
            fr, graph.fused, batch,
            analytic_bytes=batch_size * graph.fused_w * 4 * 2)
        rows.append({"kernel": "fused_record_fetch",
                     "shape": f"[{batch_size},{graph.fused_w}]", **res})

    dist = jnp.where(valid, jnp.abs(rng.standard_normal((b, d))).astype(
        jnp.float32), jnp.inf)
    keff = rel.keff[batch]
    choose = jax.jit(keep_nearest)
    res = roofline.measure(choose, dist, keff, valid,
                           analytic_bytes=b * d * (4 + 1))
    rows.append({"kernel": "choose_keep_nearest", "shape": f"[{b},{d}]",
                 **res})

    feats = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    e_pad = int(rel.col.shape[0])
    # gather E rows (no reuse credit) + col/row indices + write [N, F]
    spmm_bytes = e_pad * (f * 4 + 8) + n * (f * 4 + 4)
    if rel.nbr2d is not None and not rel.has_hubs:
        spmm_w = jax.jit(lambda rel, x: segment_mean_spmm(rel, x))
        res = roofline.measure(spmm_w, rel, feats, analytic_bytes=spmm_bytes)
        rows.append({"kernel": "spmm_window_form",
                     "shape": f"E={rel.num_edges} N={n} F={f}", **res})
    if rel.ewin is not None:
        # edge-window SpMM lowering: contiguous-DMA windows (the features
        # MUST be the graph's own — the store snapshots them)
        spmm_e = jax.jit(lambda rel, x: segment_mean_spmm(
            rel, x, assume_ewin_features=True))
        res = roofline.measure(spmm_e, rel, graph.features,
                               analytic_bytes=spmm_bytes)
        rows.append({"kernel": "spmm_ewin_form",
                     "shape": f"E={rel.num_edges} N={n} F={f}", **res})
    # forced segment_sum lowering (the keep-filter path) for comparison
    keep_all = jnp.ones((e_pad,), bool)
    spmm_s = jax.jit(lambda rel, x, k: segment_mean_spmm(rel, x, keep=k))
    res = roofline.measure(spmm_s, rel, feats, keep_all,
                           analytic_bytes=spmm_bytes)
    rows.append({"kernel": "spmm_segment_form",
                 "shape": f"E={rel.num_edges} N={n} F={f}", **res})

    s0 = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    if rel.nbr2d is not None:
        from pcgnn_tpu.ops.sddmm import edge_abs_diff_window
        sddmm_w = jax.jit(edge_abs_diff_window)
        # read nbr2d + scores, write dist + valid ([N, D] each)
        nd = n * max(int(rel.window_width), 1)
        res = roofline.measure(sddmm_w, rel, s0,
                               analytic_bytes=nd * (4 + 4 + 4 + 1))
        rows.append({"kernel": "sddmm_window_form",
                     "shape": f"E={rel.num_edges}", **res})
    if rel.ewin is not None:
        # edge-window SDDMM: neighbor scores contracted on the contiguous
        # feature windows (the exact production schedule of choose)
        from pcgnn_tpu.ops.sddmm import edge_abs_diff_window_ewin
        w0 = jnp.asarray(rng.standard_normal((f,)), jnp.float32)
        b0 = jnp.float32(0.1)
        s0g = graph.features @ w0 + b0
        sddmm_e = jax.jit(edge_abs_diff_window_ewin)
        nd = n * max(int(rel.window_width), 1)
        res = roofline.measure(sddmm_e, rel, s0g, w0, b0,
                               analytic_bytes=nd * (f * 4 + 4 + 1))
        rows.append({"kernel": "sddmm_ewin_form",
                     "shape": f"E={rel.num_edges}", **res})
    sddmm = jax.jit(edge_abs_diff)
    res = roofline.measure(sddmm, rel, s0,
                           analytic_bytes=e_pad * (4 + 4 + 4))
    rows.append({"kernel": "sddmm_flat_form",
                 "shape": f"E={rel.num_edges}", **res})
    return rows


def bench_train_step(preset: str, batch_size: int, emb_size: int):
    """Stage-ablated timings of one optimizer step: forward loss only,
    loss+grads, and the full step (loss -> grads -> Adam)."""
    import jax

    from pcgnn_tpu.train.trainer import Trainer
    from pcgnn_tpu.utils import roofline

    cfg = dict(seed=2, data_name=f"synthetic:{preset}", model="PCGNN",
               train_ratio=0.4, test_ratio=0.67, emb_size=emb_size,
               lr=0.01, weight_decay=0.001, alpha=2.0, rho=0.5,
               epochs=1, valid_epochs=10 ** 9, batch_size=batch_size,
               patience=10 ** 9, exp_num=0)
    t = Trainer(cfg)
    params = t.model.init(jax.random.key(0))
    opt_state = t.tx.init(params)
    rng = np.random.default_rng(0)
    batch = rng.choice(np.asarray(t.idx_train), batch_size)
    y = np.asarray(t.graph.labels)[batch]
    w = np.ones((batch_size,), np.float32)
    fn, args = t.single_step(params, opt_state, batch, y, w)
    (params_a, opt_a, batch_a, y_a, w_a, key_a, graph_a, consts_a) = args

    m_max = t.model.minor_window(int(consts_a["tp"].shape[0]),
                                 t.graph.relations)
    step_bytes = roofline.pcgnn_step_streaming_bytes(
        t.graph, batch_size, m_max, emb_size)

    model = t.model

    # graph/consts enter as ARGUMENTS, not closures: a closed-over graph is
    # baked into the executable as literals and overflows compile-payload
    # limits at stress scale (same rule as trainer.py's step functions)
    def fwd(params, batch, y, w, graph, consts):
        return model.loss(params, graph, batch, y, w,
                          train_pos=consts["tp"],
                          train_pos_valid=consts["tpv"])

    rows = []
    res = roofline.measure(jax.jit(fwd), params_a, batch_a, y_a, w_a,
                           graph_a, consts_a, analytic_bytes=step_bytes)
    rows.append({"kernel": "loss_fwd", "shape": f"B={batch_size}", **res})
    res = roofline.measure(jax.jit(jax.value_and_grad(fwd)), params_a,
                           batch_a, y_a, w_a, graph_a, consts_a,
                           analytic_bytes=step_bytes)
    rows.append({"kernel": "loss_grad", "shape": f"B={batch_size}", **res})
    res = roofline.measure(fn, *args, analytic_bytes=step_bytes)
    rows.append({"kernel": "train_step", "shape": f"B={batch_size}", **res})
    # device-true step: 16 scanned steps per dispatch (per-call submit
    # latency through a tunneled runtime otherwise lands in the step)
    nscan = 16
    fn16, args16 = t.single_step(params, opt_state, batch, y, w,
                                 nscan=nscan)
    res = roofline.measure(fn16, *args16,
                           analytic_bytes=step_bytes * nscan)
    res["wall_ms"] /= nscan
    rows.append({"kernel": "train_step_scan16", "shape": f"B={batch_size}",
                 **res})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="yelp-like")
    ap.add_argument("--batch_size", type=int, default=1024)
    ap.add_argument("--emb_size", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from pcgnn_tpu.data.synthetic import synthetic_fraud_graph

    from pcgnn_tpu.graph.csr import materialize_edge_windows

    graph = materialize_edge_windows(synthetic_fraud_graph(args.preset,
                                                           seed=2))
    rows = bench_relation_kernels(graph, args.batch_size)
    rows.extend(bench_train_step(args.preset, args.batch_size,
                                 args.emb_size))

    dev = jax.devices()[0]
    out = {"preset": args.preset, "device": str(dev),
           "device_kind": dev.device_kind, "kernels": rows}
    for r in rows:
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in r.items()}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
