"""Multi-host (multi-process) scaffolding.

The reference is strictly single-process/single-GPU (SURVEY.md §5
"Distributed communication backend: absent"); pcgnn_tpu scales past one
host with ``jax.distributed`` + a ('dcn', 'data', 'graph') mesh:

  * ``dcn``   — one slot per process/host.  Collectives crossing this axis
    ride the data-center network, so only the cheapest reductions are
    placed on it: the loss/grad psum (scalars + parameter-sized tensors).
    It is a pure-DP axis — an outer extension of 'data'.
  * ``data``  — batch sharding within a host (ICI).
  * ``graph`` — node/edge row-block partition of features + structure
    (``parallel.spmd.ShardedRel``) within a host, innermost so the
    per-step score all-gather and aggregation psums ride ICI, never DCN.

Axis placement rule: ``make_multihost_mesh`` keeps each process's devices
contiguous along ('data', 'graph') and stacks processes along 'dcn', so
per-step 'graph' collectives are intra-host by construction.

``parallel.spmd`` detects the extra axis via :func:`spmd.data_axes`:
batch arrays shard over ('dcn', 'data'), graph arrays over 'graph', and
the loss reduction psums over ('dcn', 'data').

Tested without a pod by launching N local processes with
``xla_force_host_platform_device_count`` CPU devices each and a
localhost coordinator (``tests/test_multihost.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


_INITIALIZED = False


def ensure_initialized(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None,
                       overlap: bool = True) -> None:
    """Idempotent :func:`init_distributed` — the Trainer/CLI entry point
    (config ``distributed: true``).  Safe to call once per process from
    anywhere that runs before the first backend touch; later calls no-op
    so sweep configs (``utils.config.grid``) can share one process."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    init_distributed(coordinator_address, num_processes, process_id,
                     overlap=overlap)
    _INITIALIZED = True


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None, overlap: bool = True) -> None:
    """Initialize the jax distributed runtime.

    On TPU pods all arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU clusters or local multi-process tests
    (e.g. ``coordinator_address='localhost:12355', num_processes=2,
    process_id=int(sys.argv[1])``).  ``overlap`` (default) also arms the
    async-collective libtpu flags (:func:`enable_collective_overlap`) —
    legal here because jax.distributed must itself run pre-backend-init.
    """
    if overlap:
        enable_collective_overlap()
    kw = {}
    if coordinator_address is not None:
        kw.update(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    if local_device_ids is not None:
        kw.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kw)


# libtpu flags that let the TPU latency-hiding scheduler run the per-step
# score all-gather / aggregation psums asynchronously, overlapping them
# with halo-independent work (the neighbor-window reads, keep-mask sorts
# and self-row gathers in parallel.spmd have no data dependency on the
# score halo until the distance compare).  SURVEY.md §5/§7: "halo exchange
# overlapped with local aggregation".  These go through LIBTPU_INIT_ARGS,
# NOT XLA_FLAGS: XLA aborts on flags unknown to the local build (CPU test
# environments have no TPU flags), while LIBTPU_INIT_ARGS is read only by
# libtpu on actual TPU hosts and is inert everywhere else.
OVERLAP_LIBTPU_FLAGS = (
    "--xla_tpu_enable_async_collective_fusion=true",
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true",
    "--xla_tpu_overlap_compute_collective_tc=true",
)


def _backend_initialized() -> bool:
    """Best-effort init-order probe; jax keeps the backend cache in private
    attributes whose names have moved across releases, so probe several and
    degrade LOUDLY (warn) rather than silently assume 'not initialized' —
    a wrong False here would let enable_collective_overlap set
    LIBTPU_INIT_ARGS after libtpu already read the env (a silent no-op)."""
    bridge = jax._src.xla_bridge  # noqa: SLF001
    probed = False
    for attr in ("_backends", "_default_backend"):
        try:
            val = getattr(bridge, attr)
        except AttributeError:
            continue
        probed = True
        if val:
            return True
    if not probed:
        import warnings

        warnings.warn(
            "pcgnn_tpu.parallel.distributed: could not determine jax "
            "backend init state (jax._src.xla_bridge internals moved); "
            "assuming uninitialized — collective-overlap flags may be a "
            "silent no-op if a backend already exists", RuntimeWarning,
            stacklevel=3)
    return False


def enable_collective_overlap() -> None:
    """Arm :data:`OVERLAP_LIBTPU_FLAGS` in ``LIBTPU_INIT_ARGS``.

    Must run before the first backend touch (libtpu reads the env at
    init); raises if a backend already exists so a silent no-op cannot
    masquerade as overlap.  Per-flag idempotent: a flag already present —
    with ANY value, e.g. an operator's explicit ``=false`` A/B override —
    is left untouched; only absent flags are appended.  Harmless no-op on
    CPU/GPU hosts (the variable is never read there).
    """
    import os

    if _backend_initialized():
        raise RuntimeError(
            "enable_collective_overlap() must be called before any jax "
            "backend initializes (import-time, like jax.distributed)")
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    # exact flag-name comparison, not substring: '--..._fusion' is a prefix
    # of '--..._fusion_fuse_all_gather', so substring matching would treat
    # the base flag as present whenever only the longer one was pre-set
    present = {tok.split("=", 1)[0] for tok in cur.split()}
    missing = [f for f in OVERLAP_LIBTPU_FLAGS
               if f.split("=", 1)[0] not in present]
    if missing:
        os.environ["LIBTPU_INIT_ARGS"] = " ".join(
            ([cur] if cur else []) + missing)


def make_multihost_mesh(graph: int = 1, *, data: Optional[int] = None) -> Mesh:
    """Build the ('dcn', 'data', 'graph') mesh over all global devices.

    ``graph`` (and optionally ``data``) size the *per-process* axes; the
    'dcn' axis length is ``jax.process_count()``.  Every process's devices
    form one contiguous ('data', 'graph') tile, so 'graph' collectives are
    intra-host (ICI) and only ('dcn',)-crossing reductions touch DCN.
    """
    n_proc = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per_proc = len(devs) // n_proc
    if per_proc * n_proc != len(devs):
        raise ValueError(f"{len(devs)} devices not even over {n_proc} procs")
    if per_proc % graph:
        raise ValueError(f"graph={graph} does not divide the {per_proc} "
                         f"devices per process")
    if data is None:
        data = per_proc // graph
    if data * graph != per_proc:
        raise ValueError(f"mesh {data}x{graph} != {per_proc} per-process "
                         f"devices")
    arr = np.array(devs, dtype=object).reshape(n_proc, data, graph)
    return Mesh(arr, axis_names=("dcn", "data", "graph"))
