"""Probe: window-gather strategies for the PC-GNN hot path (scratch bench).

The training step is bound by gathering [B, D, F] neighbor-feature windows.
XLA's scattered row gather costs one descriptor per neighbor (~330M rows/s on
v5e).  Because the feature table is frozen, each relation's neighbor features
can be pre-materialized contiguously in edge order (edge_feats[e] = x[col[e]]),
turning a row's window into ONE contiguous [deg, F] block -> one DMA per batch
row.  This measures the candidates on the current backend.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pcgnn_tpu.utils.roofline import measure


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=45954)
    ap.add_argument("--f", type=int, default=33)
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--d", type=int, default=212)
    ap.add_argument("--e", type=int, default=6_837_250)
    args = ap.parse_args()
    n, f, b, d, e = args.n, args.f, args.b, args.d, args.e

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(n + 1, f)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(0, n, size=(b, d)).astype(np.int32))
    # contiguous starts: random CSR-like offsets into an edge-feature array
    starts = jnp.asarray(np.sort(rng.integers(0, e - d, size=(b,)))
                         .astype(np.int32))
    ef_rows = e + d + 4096
    edge_feats = jnp.asarray(
        rng.normal(size=(ef_rows, f)).astype(np.float32))
    out_bytes = b * d * f * 4

    def report(name, fn, *a, extra=0):
        r = measure(fn, *a, analytic_bytes=out_bytes + extra)
        print(f"{name:28s} wall {r['wall_ms']:8.3f} ms   "
              f"{r['achieved_gbps']:7.1f} GB/s  sol {r['sol_frac']:.3f}")
        return r

    print(f"gather [B={b}, D={d}, F={f}]  out={out_bytes/1e6:.1f} MB")

    # 1. scattered row gather (current production path)
    report("xla_row_gather", lambda t, i: t[i], table, nbr)

    # 2. lax.gather with [D, F] slice sizes (contiguous blocks, XLA)
    def block_gather(ef, st):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))
        return jax.lax.gather(ef, st[:, None], dn, slice_sizes=(d, f)), 0

    report("xla_block_gather", block_gather, edge_feats, starts)

    # 3. vmapped dynamic_slice (contiguous blocks, XLA)
    def vds(ef, st):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(ef, (s, 0), (d, f)))(st)

    report("xla_vmap_dynamic_slice", vds, edge_feats, starts)

    # 4. Pallas flat ragged gather (bitcast f32 -> int32, flat layout)
    from pcgnn_tpu.ops.pallas import ragged_gather
    if ragged_gather.available():
        df = d * f
        dp = ((df + 127) // 128) * 128
        span = ((dp + 1023) // 1024) * 1024 + 1024
        flat_len = ef_rows * f
        need = ((flat_len + span + 1023) // 1024) * 1024 + span
        flat = jnp.pad(edge_feats.reshape(-1), (0, need - flat_len))
        flat_i = jax.lax.bitcast_convert_type(flat, jnp.int32)

        def pallas_flat(fl, st):
            raw = ragged_gather.ragged_window_gather(fl, st * f, dp)
            out = jax.lax.bitcast_convert_type(raw[:, :df], jnp.float32)
            return out.reshape(b, d, f)

        r = report("pallas_flat_block", pallas_flat, flat_i, starts)
        # correctness spot-check
        got = np.asarray(jax.jit(pallas_flat)(flat_i, starts))
        want = np.asarray(vds(edge_feats, starts))
        ok = np.array_equal(got, want)
        print(f"pallas_flat_block correct: {ok}")
    else:
        print("pallas ragged gather unavailable on this backend")

    # 5. scattered row gather at bf16 (is the bound bytes or descriptors?)
    table_bf = table.astype(jnp.bfloat16)
    report("xla_row_gather_bf16", lambda t, i: t[i], table_bf, nbr,
           extra=-out_bytes // 2)


if __name__ == "__main__":
    main()
