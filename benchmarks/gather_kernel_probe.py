"""Probe: Pallas window-gather kernel variants (scratch bench).

Explores the design space for the edge-materialized window gather:
  A. current ragged_window_gather (2 slots, 8 rows/cell, in-register shift)
  B. deeper pipeline (K slots, R rows/cell, shift)
  C. aligned starts (per-node 1024-aligned edge runs): DMA straight into the
     output block, no shift, K DMAs in flight.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcgnn_tpu.utils.roofline import measure

_CH = 1024
_L = 128


def _aligned_kernel(starts_ref, col_hbm, out_ref, sems, *, rows, dp_rows):
    """starts are 1024-aligned: DMA directly into the output block."""
    i = pl.program_id(0)

    def get_dma(r):
        start = starts_ref[i * rows + r]
        rstart = pl.multiple_of((start // _CH) * (_CH // _L), _CH // _L)
        return pltpu.make_async_copy(
            col_hbm.at[pl.ds(rstart, dp_rows)],
            out_ref.at[r],
            sems.at[r],
        )

    for r in range(rows):
        get_dma(r).start()
    for r in range(rows):
        get_dma(r).wait()


@functools.partial(jax.jit, static_argnames=("d_pad", "rows"))
def aligned_window_gather(col: jax.Array, starts: jax.Array, d_pad: int,
                          rows: int = 8) -> jax.Array:
    dp_rows = d_pad // _L
    b = starts.shape[0]
    b_pad = ((b + rows - 1) // rows) * rows
    if b_pad != b:
        starts = jnp.concatenate(
            [starts, jnp.zeros((b_pad - b,), starts.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows, dp_rows, _L), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((rows,)),
        ],
    )
    col2d = col.reshape(-1, _L)
    out = pl.pallas_call(
        functools.partial(_aligned_kernel, rows=rows, dp_rows=dp_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, dp_rows, _L), jnp.int32),
    )(starts, col2d)
    return out[:b].reshape(b, dp_rows * _L)


def _shift_kernel(starts_ref, col_hbm, out_ref, scratch, sems, *, rows,
                  dp_rows, span, slots):
    i = pl.program_id(0)
    s_rows = span // _L

    def get_dma(slot, r):
        start = starts_ref[i * rows + r]
        rstart = pl.multiple_of((start // _CH) * (_CH // _L), _CH // _L)
        return pltpu.make_async_copy(
            col_hbm.at[pl.ds(rstart, s_rows)],
            scratch.at[slot],
            sems.at[slot],
        )

    for r in range(min(slots - 1, rows)):
        get_dma(r % slots, r).start()
    for r in range(rows):
        slot = r % slots
        if r + slots - 1 < rows:
            get_dma((r + slots - 1) % slots, r + slots - 1).start()
        get_dma(slot, r).wait()
        off = starts_ref[i * rows + r] % _CH
        q, rm = off // _L, off % _L
        buf = scratch[slot]
        a = pltpu.roll(buf, (s_rows - q) % s_rows, 0)
        b = pltpu.roll(buf, (s_rows - q - 1) % s_rows, 0)
        a = pltpu.roll(a, (_L - rm) % _L, 1)
        b = pltpu.roll(b, (_L - rm) % _L, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (s_rows, _L), 1)
        ext = jnp.where(lanes < (_L - rm), a, b)
        out_ref[r, :, :] = ext[:dp_rows, :]


@functools.partial(jax.jit, static_argnames=("d_pad", "rows", "slots"))
def shift_window_gather(col, starts, d_pad: int, rows: int, slots: int):
    dp_rows = d_pad // _L
    span = ((d_pad + _CH - 1) // _CH) * _CH + _CH
    b = starts.shape[0]
    b_pad = ((b + rows - 1) // rows) * rows
    if b_pad != b:
        starts = jnp.concatenate(
            [starts, jnp.zeros((b_pad - b,), starts.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows, dp_rows, _L), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, span // _L, _L), jnp.int32),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    col2d = col.reshape(-1, _L)
    out = pl.pallas_call(
        functools.partial(_shift_kernel, rows=rows, dp_rows=dp_rows,
                          span=span, slots=slots),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, dp_rows, _L), jnp.int32),
    )(starts, col2d)
    return out[:b].reshape(b, dp_rows * _L)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--d", type=int, default=212)
    ap.add_argument("--f", type=int, default=33)
    ap.add_argument("--e", type=int, default=6_837_250)
    args = ap.parse_args()
    b, d, f, e = args.b, args.d, args.f, args.e

    rng = np.random.default_rng(0)
    df = d * f
    dp = ((df + 127) // 128) * 128
    span = ((dp + 1023) // 1024) * 1024 + 1024
    out_bytes = b * dp * 4

    # flat edge-feature array, int32-bitcast
    flat_len = e * f
    need = ((flat_len + span + 1023) // 1024) * 1024 + span
    flat = rng.integers(-2**30, 2**30, size=(need,)).astype(np.int32)
    flat_j = jnp.asarray(flat)
    starts = np.sort(rng.integers(0, flat_len - span, size=(b,))).astype(np.int32)
    starts_j = jnp.asarray(starts)
    starts_al = jnp.asarray((starts // 1024) * 1024)

    def report(name, fn, *a):
        r = measure(fn, *a, analytic_bytes=out_bytes)
        print(f"{name:34s} wall {r['wall_ms']:8.3f} ms   "
              f"{r['achieved_gbps']:7.1f} GB/s  sol {r['sol_frac']:.3f}")

    print(f"window [B={b}, dp={dp}]  out={out_bytes/1e6:.1f} MB")
    from pcgnn_tpu.ops.pallas import ragged_gather
    report("A: current (rows=8, slots=2)",
           lambda c, s: ragged_gather.ragged_window_gather(c, s, dp),
           flat_j, starts_j)
    for rows, slots in [(8, 4), (16, 8), (32, 8), (32, 16), (64, 16)]:
        report(f"B: shift rows={rows} slots={slots}",
               functools.partial(shift_window_gather, d_pad=dp, rows=rows,
                                 slots=slots), flat_j, starts_j)
    for rows in (8, 16, 32, 64):
        report(f"C: aligned rows={rows}",
               functools.partial(aligned_window_gather, d_pad=dp, rows=rows),
               flat_j, starts_al)
    # correctness spot-checks
    got = np.asarray(aligned_window_gather(flat_j, starts_al, dp, 16))
    want = np.stack([flat[s:s + dp] for s in np.asarray(starts_al)])
    print("aligned correct:", np.array_equal(got, want))
    got = np.asarray(shift_window_gather(flat_j, starts_j, dp, 16, 8))
    want = np.stack([flat[s:s + dp] for s in starts])
    print("shift correct:", np.array_equal(got, want))


if __name__ == "__main__":
    main()
