"""Pallas TPU kernel: ragged contiguous-run gather for CSR batch windows.

``batch_neighbor_window``'s CSR fallback (used when the dense [N, dmax]
neighbor table exceeds the HBM budget, e.g. 10M-node stress graphs) reads,
for each batch row b, the *contiguous* slice ``col[indptr[b] : indptr[b]+D]``.
XLA lowers that as a generic scattered element gather (~1e8 elem/s on TPU);
the contiguity makes it a natural per-row DMA instead.

Mosaic constraints shape the kernel:
  * HBM slices of a 1-D int32 array must be aligned to its (1024,) tiling in
    both start and length -> DMA the 1024-aligned superset
    ``col[align1024(start) : align1024(start) + span]``.
  * 1-D dynamic rotates are unsupported -> the flat in-register shift by
    ``off = start % 1024`` is decomposed over a (span/128, 128) view into a
    sublane rotate (off // 128), a lane rotate (off % 128), and a lane-index
    select between the two adjacent-sublane copies (the carry).

The kernel only moves indices (int32); feature rows are still gathered by
XLA (they are genuinely scattered).  ``available()`` compile-probes the
current backend once and callers fall back transparently (CPU tests run
interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8    # batch rows per grid cell
_CH = 1024   # HBM tiling granule for 1-D int32 memrefs
_L = 128     # lane width


def _gather_kernel(starts_ref, col_hbm, out_ref, scratch, sems, *, dp_rows,
                   span):
    i = pl.program_id(0)
    s_rows = span // _L

    def get_dma(slot, r):
        start = starts_ref[i * _ROWS + r]
        # sublane-aligned 2-D row slice of the [E/128, 128] view; the row
        # start is a multiple of 8 (= 1024/128), matching int32 (8, 128)
        # HBM tiling
        rstart = pl.multiple_of((start // _CH) * (_CH // _L), _CH // _L)
        return pltpu.make_async_copy(
            col_hbm.at[pl.ds(rstart, s_rows)],
            scratch.at[slot],
            sems.at[slot],
        )

    get_dma(0, 0).start()
    for r in range(_ROWS):  # static unroll; double-buffered DMAs
        slot = r % 2
        if r + 1 < _ROWS:
            get_dma((r + 1) % 2, r + 1).start()
        get_dma(slot, r).wait()
        off = starts_ref[i * _ROWS + r] % _CH
        q, rm = off // _L, off % _L
        buf = scratch[slot]                                # (s_rows, 128)
        # flat[j] for j in [off, off+dp_rows*128): out[s, l] =
        # buf[s + q + carry, (l + rm) % 128], carry = (l + rm) >= 128
        a = pltpu.roll(buf, (s_rows - q) % s_rows, 0)      # a[s] = buf[s+q]
        b = pltpu.roll(buf, (s_rows - q - 1) % s_rows, 0)  # b[s] = buf[s+q+1]
        a = pltpu.roll(a, (_L - rm) % _L, 1)   # a[s,l] = buf[s+q, (l+rm)%128]
        b = pltpu.roll(b, (_L - rm) % _L, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (s_rows, _L), 1)
        ext = jnp.where(lanes < (_L - rm), a, b)
        out_ref[r, :, :] = ext[:dp_rows, :]


@functools.partial(jax.jit, static_argnames=("d_pad", "interpret"))
def ragged_window_gather(col: jax.Array, starts: jax.Array, d_pad: int,
                         *, interpret: bool = False) -> jax.Array:
    """out[b, :] = col[starts[b] : starts[b] + d_pad] for each batch row.

    Args:
      col: [E_pad] int32; must satisfy
        E_pad >= align1024(max(starts)) + roundup1024(d_pad) + 1024
        (the graph store pads the edge array accordingly,
        ``graph.csr._finalize``).
      starts: [B] int32 row start offsets (CSR indptr gathered at batch).
      d_pad: static window width, multiple of 128.

    Returns [B, d_pad] int32.
    """
    assert d_pad % _L == 0, d_pad
    dp_rows = d_pad // _L
    span = ((d_pad + _CH - 1) // _CH) * _CH + _CH
    b = starts.shape[0]
    b_pad = ((b + _ROWS - 1) // _ROWS) * _ROWS
    if b_pad != b:
        starts = jnp.concatenate(
            [starts, jnp.zeros((b_pad - b,), starts.dtype)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // _ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_ROWS, dp_rows, _L), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, span // _L, _L), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    assert col.shape[0] % _CH == 0, col.shape
    col2d = col.reshape(-1, _L)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, dp_rows=dp_rows, span=span),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, dp_rows, _L), jnp.int32),
        interpret=interpret,
    )(starts, col2d)
    return out[:b].reshape(b, d_pad)


_SUPPORTED: bool | None = None


def available() -> bool:
    """True when the kernel compiles and runs on the current default backend
    (checked once per process with a tiny instance).

    The probe is AOT (lower + compile + execute on concrete arrays): the
    first call may come from inside a jit trace (the kernel is used under
    lax loops), and an AOT executable can neither be staged into the
    enclosing computation nor broken by it.  (The previous probe wrapped a
    jitted call in ``ensure_compile_time_eval``, which *disables* jit and
    traced the pallas kernel eagerly — failing on every backend and
    silently losing the kernel.)
    """
    global _SUPPORTED
    if _SUPPORTED is None:
        try:
            import numpy as np
            col = np.arange(8192, dtype=np.int32)
            sts = [0, 17, 100, 1500, 3, 255, 129, 2000]
            starts = np.asarray(sts, np.int32)
            fn = functools.partial(ragged_window_gather, d_pad=128)
            compiled = jax.jit(fn).lower(
                jax.ShapeDtypeStruct(col.shape, col.dtype),
                jax.ShapeDtypeStruct(starts.shape, starts.dtype)).compile()
            out = np.asarray(jax.device_get(compiled(col, starts)))
            want = np.stack([np.arange(s, s + 128) for s in sts])
            _SUPPORTED = bool(np.array_equal(out, want))
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED
