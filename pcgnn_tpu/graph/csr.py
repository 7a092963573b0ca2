"""Static padded CSR graph store.

The reference stores each relation as a ``defaultdict(set)`` adjacency list
(reference ``src/utils.py:226-254``) and re-derives neighbor lists with Python
set operations on every minibatch (``src/layers.py:217-227``).  On TPU that is
replaced by an immutable, statically-shaped CSR per relation, built once on the
host; every epoch then runs as pure array programs.

Per relation we keep:
  * ``indptr [N+1]``  — row pointers.
  * ``col    [E_pad]``— column (neighbor) ids, padded with ``N`` (a dummy id).
  * ``edge_rows()``   — per-edge row ids, derived on device from indptr.
  * ``deg    [N]``    — row degree (self-loops included, as in the reference).
  * ``keff   [N]``    — number of neighbors the *choose* step keeps:
        k      = ceil(threshold * deg)              (``src/layers.py:260-262``)
        keff   = deg  if deg <= k + 1  else  k      (``src/layers.py:662-672``)
    (the reference keeps *all* neighbors when ``len(neighs) <= num_sample+1``).
  * ``dmax``          — max row degree (static pad width for batch windows).

All arrays are ``jnp`` on device; construction helpers take numpy/scipy.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import warnings
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RelGraph:
    """One relation's static CSR. A pytree; safe to pass to jit as an arg.

    The CSR-expanded per-edge row array is NOT stored (at stress scale it
    is gigabytes of HBM used only by full-graph paths); ``edge_rows()``
    derives it from ``indptr`` on device when needed.
    """

    indptr: jax.Array  # [N+1] int32
    col: jax.Array     # [E_pad] int32, padding = N
    deg: jax.Array     # [N] int32
    keff: jax.Array    # [N] int32
    ksample: jax.Array  # [N] int32: ceil(threshold*deg) — oversample base count
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    dmax: int = dataclasses.field(metadata=dict(static=True))
    # static bound on ksample over all nodes: sizes the compact oversample
    # candidate window (ops.aggregate.oversample_candidates)
    ksample_max: int = dataclasses.field(default=0, metadata=dict(static=True))
    # static bound on ksample over WINDOW-LANE rows only (deg <= dcap).
    # Hub rows' minors run through the hub lane's exact band selection
    # (ops.hub.chunk_minor_band), so the per-row compact candidate window
    # only needs to cover non-hub requests — on skew graphs this keeps the
    # window O(dcap·thr·rho) instead of O(dmax·thr·rho) ~ the whole pool.
    # 0 means "= ksample_max" (uncapped relations; legacy pytrees).
    ksample_cap: int = dataclasses.field(default=0, metadata=dict(static=True))
    # window cap: batch neighbor windows are [B, dcap], NOT [B, dmax].  On
    # near-uniform graphs the build policy keeps dcap == dmax (single lane,
    # identical to the uncapped layout); on heavy-tailed graphs (reference
    # YelpChi RSR links whole same-star-same-month cliques,
    # ``src/utils.py:72-91``) dcap ~ p99.5 of degree so per-step memory
    # scales with touched edges, and rows with deg > dcap ("hubs") go
    # through the blockwise ``ops.hub`` lane.  0 means "= dmax" (legacy).
    dcap: int = dataclasses.field(default=0, metadata=dict(static=True))
    # True for degree-only stubs (``degree_stub``): deg/keff are real but the
    # edge list is empty.  Window/full-graph consumers must reject stubs —
    # otherwise they would silently aggregate zero phantom neighbors.
    is_stub: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # optional dense [N, dmax] neighbor table (padding = N).  XLA lowers the
    # strided CSR window gather to a slow scattered gather (~5ms at YelpChi
    # scale); a row gather from this table is 5.7x faster.  Built when the
    # table fits the HBM budget (see ``_finalize``), else None and
    # ``batch_neighbor_window`` falls back to the CSR gather.
    nbr2d: jax.Array | None = None
    # optional edge-materialized feature store (``attach_edge_windows``):
    # the FROZEN node features laid out in CSR edge order, each node's run
    # 1024-aligned, so a batch row's whole [dcap, F] feature window is ONE
    # contiguous HBM block -> one DMA (ops.pallas.window_gather) instead of
    # dcap scattered row fetches.  ``ewin`` is the flat [L] f32 store,
    # ``estart`` the [N] int32 per-node element offsets, ``ewin_dp`` the
    # static padded window length in elements (multiple of 1024).
    ewin: jax.Array | None = None
    estart: jax.Array | None = None
    ewin_dp: int = dataclasses.field(default=0, metadata=dict(static=True))
    # True: per-node runs start on 1024-element boundaries (DMA-direct
    # kernel).  False: exact packing, realigned in registers by the shift
    # kernel — chosen at build time when alignment padding would waste
    # >25% of the store (low-degree graphs: stress presets' mean run is
    # about one alignment granule).
    ewin_aligned: bool = dataclasses.field(default=True,
                                           metadata=dict(static=True))
    # feature width the store was built with (consumers assert against it:
    # the store is a SNAPSHOT of the graph's frozen features)
    ewin_f: int = dataclasses.field(default=0, metadata=dict(static=True))
    # LOGICAL stored row width: == ewin_f for float32 stores; bfloat16
    # stores round it up to even (consumers slice the zero pad column back
    # off).  0 = ewin_f.
    ewin_fs: int = dataclasses.field(default=0, metadata=dict(static=True))
    # True: the store holds bfloat16 features PACKED two-per-f32-word
    # (split-column packing: word j of a slot = (col j, col j + fs/2), so
    # unpacking is two same-width bitcasts + one concat — no minor-dim-2
    # interleave, which XLA would materialize at (8,128)-tile padding =
    # 64x HBM).  ewin stays a physical f32 array and estart/ewin_dp are in
    # PACKED WORDS, so every kernel/layout invariant is the f32 one.
    ewin_packed: bool = dataclasses.field(default=False,
                                          metadata=dict(static=True))
    # packed per-node int32 metadata [N, 4] = (deg, keff, ksample, estart):
    # a TPU gather pays a fixed dispatch cost regardless of row width, so
    # the training step fetches all four per-relation columns in ONE row
    # gather instead of four element gathers (profiled: the step spent
    # ~0.6 ms/step in ~20 small gathers).  Built with the edge-window store.
    meta: jax.Array | None = None

    @property
    def e_pad(self) -> int:
        return self.col.shape[0]

    @property
    def window_width(self) -> int:
        """Static batch-window width: dcap, falling back to dmax."""
        return self.dcap if self.dcap else max(self.dmax, 0)

    @property
    def has_hubs(self) -> bool:
        """True when some rows exceed the window cap and need the
        blockwise hub lane (``ops.hub``)."""
        return self.window_width < self.dmax

    def edge_rows(self) -> jax.Array:
        """[E_pad] per-edge CSR row ids (padding edges get ``num_nodes``),
        derived on device from ``indptr``: row[e] = searchsorted(indptr, e,
        'right') - 1.  O(E log N); call inside jit."""
        e = self.col.shape[0]
        eidx = jax.lax.broadcasted_iota(jnp.int32, (e, 1), 0)[:, 0]
        row = jnp.searchsorted(self.indptr, eidx, side="right",
                               method="sort").astype(jnp.int32) - 1
        return jnp.where(eidx < self.num_edges, row, self.num_nodes)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultiRelGraph:
    """Multi-relation graph + node features/labels.

    Mirrors the tuple returned by the reference loader
    ``load_data -> (homo, relation_list, feat_data, labels)``
    (``src/utils.py:66-210``) as one device-resident structure.
    """

    relations: tuple  # tuple[RelGraph, ...]
    homo: RelGraph
    features: jax.Array  # [N, F] float32
    labels: jax.Array    # [N] int32
    # optional packed per-node batch-constant table (``_build_node_pack``):
    # [N, F + 4R + sum_r D_r] f32 with the per-relation (deg, keff, ksample,
    # estart) metadata and nbr2d neighbor-id columns bitcast through f32.
    # A TPU row gather pays a fixed ~16 us dispatch cost, so the training
    # step fetches self features + all relations' metadata + all neighbor
    # ids in ONE gather instead of 1 + 4R of them.  Column layout is derived
    # from the relations' static widths (models.pcgnn.forward).
    node_pack: jax.Array | None = None
    # optional sentinel-padded feature table [N+1, F] (zero row appended):
    # concatenating it per step copies the WHOLE table (measured 1.6 ms at
    # 1M nodes x 64 features); materialization precomputes it once.
    features_pad: jax.Array | None = None
    # optional FUSED edge-window record store (``_build_fused_store``):
    # row v = the concatenation of ALL relations' edge-window sections
    # (relation r's section at static word offset fused_off[r], width =
    # that relation's ewin_dp), so one batch step fetches every relation's
    # neighbor-feature window with ONE row fetch instead of R window
    # gathers.  The per-row descriptor cost dominates the window gather at
    # reference scale (it is dispatch-bound, not bandwidth-bound), so
    # fusing R=3 relations cuts the gather stage ~3x; at the fused record
    # width (~18 KB/row) XLA's native 2D row gather beats even the
    # one-DMA-per-row Pallas kernel (probed on v5e: 0.27 vs 0.38 ms at
    # B=1024), so the store is a plain [N_pad, W] table read as
    # ``fused[batch]`` — no Pallas, no estart gather, and sections are
    # 128-granule tight (no per-relation 1024 alignment).  ``fused_off``
    # holds R+1 offsets: section r spans [off[r], off[r+1]).
    fused: jax.Array | None = None               # [N_pad, fused_w] f32 words
    fused_w: int = dataclasses.field(default=0, metadata=dict(static=True))
    fused_off: tuple = dataclasses.field(default=(),
                                         metadata=dict(static=True))

    @property
    def num_nodes(self) -> int:
        return self.homo.num_nodes

    @property
    def num_relations(self) -> int:
        return len(self.relations)

    @property
    def feat_dim(self) -> int:
        return int(self.features.shape[1])


def csr_from_edges(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    threshold: float = 0.5,
    add_self_loops: bool = True,
    symmetrize: bool = True,
    edge_pad_multiple: int = 128,
    window_cap: int | None = None,
) -> RelGraph:
    """Build a RelGraph from a raw edge list.

    Reproduces the reference's offline prep ``sparse_to_adjlist``
    (``src/utils.py:226-242``): add self-loops, symmetrize, dedupe
    (set semantics), then lays the result out as padded CSR.

    ``window_cap``: explicit batch-window cap (see ``RelGraph.dcap``);
    None applies the automatic heavy-tail policy (``_window_cap``).
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    from pcgnn_tpu import native
    if native.available():
        # multi-threaded C++ core: counting + per-row sorts, no global key sort
        indptr, col, _row = native.build_csr(
            src, dst, num_nodes, symmetrize=symmetrize,
            add_self_loops=add_self_loops)
        return _finalize(indptr, col, num_nodes, threshold,
                         edge_pad_multiple, window_cap)
    if symmetrize:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    if add_self_loops:
        loops = np.arange(num_nodes, dtype=np.int64)
        src = np.concatenate([src, loops])
        dst = np.concatenate([dst, loops])
    # dedupe (adjacency sets in the reference collapse parallel edges)
    key = src * num_nodes + dst
    key = np.unique(key)
    src = (key // num_nodes).astype(np.int64)
    dst = (key % num_nodes).astype(np.int64)
    # np.unique sorts, so (src, dst) is already in CSR order
    deg = np.bincount(src, minlength=num_nodes).astype(np.int64)
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    return _finalize(indptr, dst, num_nodes, threshold, edge_pad_multiple,
                     window_cap)


def csr_from_scipy(mat, *, threshold: float = 0.5, add_self_loops: bool = True,
                   symmetrize: bool = True, edge_pad_multiple: int = 128,
                   window_cap: int | None = None) -> RelGraph:
    """Build a RelGraph from a scipy sparse matrix (values ignored)."""
    coo = mat.tocoo()
    return csr_from_edges(
        coo.row, coo.col, mat.shape[0], threshold=threshold,
        add_self_loops=add_self_loops, symmetrize=symmetrize,
        edge_pad_multiple=edge_pad_multiple, window_cap=window_cap)


def csr_from_adj_dict(adj: dict, num_nodes: int, *, threshold: float = 0.5,
                      edge_pad_multiple: int = 128,
                      window_cap: int | None = None) -> RelGraph:
    """Build a RelGraph from a reference-format adjacency dict of sets.

    This ingests the pickled ``defaultdict(set)`` files the reference trains
    from (``src/utils.py:79-135``). No self-loop/symmetry processing is done:
    those files already contain both (``sparse_to_adjlist``).
    """
    deg = np.zeros(num_nodes, dtype=np.int64)
    for n, neighs in adj.items():
        deg[int(n)] = len(neighs)
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    col = np.empty(int(indptr[-1]), dtype=np.int64)
    for n, neighs in adj.items():
        s, e = indptr[int(n)], indptr[int(n) + 1]
        col[s:e] = sorted(int(x) for x in neighs)
    return _finalize(indptr, col, num_nodes, threshold, edge_pad_multiple,
                     window_cap)


# dense neighbor-table HBM budget (bytes); tables above this stay CSR-only
NBR2D_BUDGET_BYTES = 512 * 1024 * 1024


def _dense_neighbor_table(indptr: np.ndarray, col: np.ndarray,
                          num_nodes: int, width: int) -> np.ndarray | None:
    """[N, width] row-major neighbor table; rows longer than ``width``
    (hub rows under a window cap) keep only their first ``width`` CSR
    entries — the hub lane reads their tails from the CSR directly."""
    d = max(width, 1)
    if num_nodes * d * 4 > NBR2D_BUDGET_BYTES:
        return None
    nbr2d = np.full((num_nodes, d), num_nodes, dtype=np.int32)
    if len(col):
        rows = np.repeat(np.arange(num_nodes), np.diff(indptr))
        slots = np.arange(len(col)) - indptr[rows]
        fit = slots < d
        nbr2d[rows[fit], slots[fit]] = col[fit]
    return nbr2d


def _window_cap(deg: np.ndarray, dmax: int, window_cap: int | None) -> int:
    """Batch-window width policy (``RelGraph.dcap``).

    Near-uniform degree distributions keep ``dcap == dmax``: a single
    window lane, bit-identical to the historical uncapped layout.  Heavy
    tails (dmax far beyond the p99.5 degree — the YelpChi-RSR clique
    pattern) cap at ~p99.5 so the per-step ``[B, dcap, F]`` gather cannot
    blow up with the global max degree; the <0.5% of rows above the cap
    route through the blockwise hub lane (``ops.hub``).
    """
    if window_cap is not None:
        return min(int(window_cap), dmax)
    if dmax <= 128 or deg.size == 0:
        return dmax
    cap = _round_up(max(int(np.percentile(deg, 99.5)), 16), 16)
    return dmax if dmax <= 2 * cap else cap


def _finalize(indptr: np.ndarray, col: np.ndarray,
              num_nodes: int, threshold: float, edge_pad_multiple: int,
              window_cap: int | None = None) -> RelGraph:
    num_edges = int(indptr[-1])
    deg = np.diff(indptr).astype(np.int32)
    # choose keep-counts (see class docstring for the reference rule)
    k = np.ceil(threshold * deg).astype(np.int32)
    keff = np.where(deg <= k + 1, deg, k).astype(np.int32)
    dmax = int(deg.max()) if num_nodes else 0
    dcap = _window_cap(deg, dmax, window_cap)
    # pad the edge array beyond num_edges so the Pallas ragged window gather
    # can DMA the 1024-aligned superset of [start, start+dmax_pad) for ANY
    # row without bounds checks (ops.pallas.ragged_gather: span =
    # roundup1024(d_pad) + 1024 from a 1024-aligned start).  The hub lane
    # (ops.hub) slides block starts up to indptr[v] + dmax, so the pad
    # covers align1024(num_edges + dmax) + block_span: roundup1024(dmax)
    # + 2048 beyond num_edges.
    win_pad = _round_up(_round_up(max(dmax, 1), 128), 1024) + 2048
    # lcm keeps the edge array 1024-divisible (a ragged_window_gather
    # invariant) for ANY caller-chosen edge_pad_multiple
    e_pad = max(_round_up(max(num_edges, 1) + win_pad,
                          math.lcm(max(edge_pad_multiple, 1), 1024)), 1024)
    col_p = np.full(e_pad, num_nodes, dtype=np.int32)
    col_p[:num_edges] = col
    # dense neighbor table holds only the window lane's first dcap slots;
    # hub rows' tails are read straight from the CSR by the hub lane
    nbr2d = _dense_neighbor_table(indptr, col[:num_edges], num_nodes, dcap)
    return RelGraph(
        indptr=jnp.asarray(indptr, dtype=jnp.int32),
        col=jnp.asarray(col_p),
        deg=jnp.asarray(deg),
        keff=jnp.asarray(keff),
        ksample=jnp.asarray(k),
        num_nodes=num_nodes,
        num_edges=num_edges,
        dmax=dmax,
        ksample_max=int(k.max()) if num_nodes else 0,
        ksample_cap=int(k[deg <= dcap].max(initial=0)) if num_nodes else 0,
        dcap=dcap,
        nbr2d=jnp.asarray(nbr2d) if nbr2d is not None else None,
    )


def degree_stub(deg: np.ndarray, *, threshold: float = 0.5) -> RelGraph:
    """A degree-only RelGraph: real ``deg``/``keff``/``ksample`` but a
    1-slot edge list.  Used where only degrees are consumed (e.g. the homo
    graph of stress presets feeds nothing but the pick sampler's weights) —
    a 200M-edge homo CSR would cost ~1.6 GB of HBM for those degrees alone.
    Neighbor windows over a stub are empty; full-graph paths must not use it.
    """
    deg = np.asarray(deg)
    num_nodes = int(deg.shape[0])
    k = np.ceil(threshold * deg).astype(np.int32)
    keff = np.where(deg <= k + 1, deg, k).astype(np.int32)
    return RelGraph(
        indptr=jnp.zeros(num_nodes + 1, jnp.int32),
        # 2048 sentinel slots: enough for one full ragged-gather DMA span
        # (roundup1024(128) + 1024), keeping even stub windows in bounds
        col=jnp.full((2048,), num_nodes, jnp.int32),
        deg=jnp.asarray(deg, jnp.int32),
        keff=jnp.asarray(keff),
        ksample=jnp.asarray(k),
        num_nodes=num_nodes,
        num_edges=0,
        dmax=0,
        ksample_max=int(k.max()) if num_nodes else 0,
        ksample_cap=int(k.max()) if num_nodes else 0,
        is_stub=True,
        nbr2d=None,
    )


def build_multirel(
    relations: Sequence[RelGraph],
    homo: RelGraph,
    features: np.ndarray,
    labels: np.ndarray,
) -> MultiRelGraph:
    return MultiRelGraph(
        relations=tuple(relations),
        homo=homo,
        features=jnp.asarray(np.asarray(features), dtype=jnp.float32),
        labels=jnp.asarray(np.asarray(labels), dtype=jnp.int32),
    )


# edge-window feature-store HBM budgets (bytes): per single store, and
# total across a graph's relations (materialize_edge_windows attaches
# biggest-relations-first until the total is spent); relations left out
# fall back to the scattered gather transparently
EWIN_BUDGET_BYTES = 4 * 1024 * 1024 * 1024
EWIN_TOTAL_BUDGET_BYTES = 6 * 1024 * 1024 * 1024


def attach_edge_windows(rel: RelGraph, features: np.ndarray,
                        *, budget_bytes: int = EWIN_BUDGET_BYTES,
                        dtype=jnp.float32) -> RelGraph:
    """Materialize the relation's neighbor features in CSR edge order.

    Valid ONLY for frozen feature tables (the reference's, and this
    framework's: ``model_handler.py:86`` trains the embedding with
    requires_grad=False) — the store is a copy and would go stale if
    features were learned.  Each node's run holds its first
    ``min(deg, dcap)`` neighbors' feature rows (the window lane's view;
    hub tails stay in the CSR for ``ops.hub``), starting on a 1024-element
    boundary so the Pallas window gather can DMA it without realignment.

    ``dtype``: float32 (bit-exact vs the scattered path) or bfloat16.  The
    step is window-gather-bound at reference scale (ROOFLINE_r02.json), so
    a bfloat16 store halves the dominant HBM traffic; consumers upcast to
    f32 right after the gather — the stored feature VALUES round, every
    downstream accumulation stays f32, and the model rounds ALL selection
    scoring through bf16 too so the choose ranking stays internally
    consistent (models.pcgnn sel_round).  Layout: the slot width
    rounds to an even ``ewin_fs`` and each slot's bf16 values are PACKED
    two-per-f32-word on the host (word j = columns (j, j + fs/2)); the
    store is then a physical f32 array in packed-word units and the whole
    f32 build/kernel/layout machinery runs unchanged.  Unpacking is two
    same-width bitcasts + one concat (ops.aggregate.batch_feature_window)
    — a narrowing bitcast/minor-dim-2 interleave would be (8,128)-tile
    padded by XLA to 64x the HBM.

    Returns the relation unchanged when it is a stub, has no dense
    neighbor table, or the store would exceed ``budget_bytes``.
    """
    if rel.is_stub or rel.nbr2d is None:
        return rel
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"edge-window store dtype must be float32 or "
                         f"bfloat16, got {dtype}")
    packed = dtype == jnp.dtype(jnp.bfloat16)
    f = int(np.shape(features)[1])
    fs = f + (f % 2) if packed else f     # logical slot width (even if bf16)
    fw = fs // 2 if packed else fs        # slot width in stored f32 WORDS
    d = max(rel.window_width, 1)
    dp = _round_up(d * fw, 1024)
    deg = np.asarray(rel.deg)
    degc = np.minimum(deg, d).astype(np.int64)
    runs_exact = degc * fw
    runs_al = _round_up_arr(runs_exact, 1024)

    def layout(runs):
        estart = np.zeros(rel.num_nodes, dtype=np.int64)
        np.cumsum(runs[:-1], out=estart[1:])
        total = int(estart[-1] + runs[-1]) if rel.num_nodes else 0
        # end slack covers the widest read of either kernel (the shift
        # kernel DMAs the 1024-aligned superset span of the final window);
        # rounded to whole build chunks so the on-device assembly needs no
        # final slice-copy of the multi-GB buffer
        return estart, _round_up(total + dp + 3072, _EWIN_BUILD_CHUNK)

    # aligned when it fits: alignment padding costs only HBM capacity,
    # while the unaligned shift kernel costs real read bandwidth + VPU
    # rotates (~45% slower gathers) — it is purely the capacity fallback
    # for low-degree stores whose padding would bust the budget (stress
    # presets: mean run about one alignment granule -> 60%+ padding)
    estart, length = layout(runs_al)
    aligned = True
    if length * 4 > budget_bytes:
        estart, length = layout(runs_exact)
        aligned = False
        if length * 4 > budget_bytes:
            return rel
    estart_dev = jnp.asarray(estart, dtype=jnp.int32)
    feats_np = np.asarray(features, np.float32)
    if packed:
        feats_np = _pack_bf16_pairs(feats_np, fs)     # [N, fw] packed words
    # The store is assembled ON DEVICE from buffers that are already
    # device-resident (features, col, indptr): a host-side numpy build
    # would push the multi-GB flat array through the host->device link —
    # ~500 s through a tunneled TPU runtime at YelpChi scale, vs ~1 s of
    # on-device element gathers here.  A build failure (e.g. a runtime
    # worker crash at multi-GB scale) degrades to the scattered-gather
    # lane instead of killing the trainer.
    try:
        flat = _ewin_build(jnp.asarray(feats_np), rel.col,
                           rel.indptr, estart_dev,
                           jnp.asarray(degc, jnp.int32), f=fw, length=length)
        jax.block_until_ready(flat)
    except Exception as e:  # pragma: no cover - runtime-dependent
        warnings.warn(
            f"edge-window store build failed ({type(e).__name__}: {e}); "
            f"relation keeps the scattered-gather path")
        return rel
    meta = np.stack([deg.astype(np.int32),
                     np.asarray(rel.keff, np.int32),
                     np.asarray(rel.ksample, np.int32),
                     estart.astype(np.int32)], axis=1)
    return dataclasses.replace(
        rel,
        ewin=flat,
        estart=estart_dev,
        ewin_dp=dp,
        ewin_f=f,
        ewin_fs=fs,
        ewin_packed=packed,
        ewin_aligned=aligned,
        meta=jnp.asarray(meta),
    )


def _pack_bf16_pairs(feats: np.ndarray, fs: int) -> np.ndarray:
    """[N, F] f32 -> [N, fs/2] f32 words, each holding bf16(col j) in the
    low 16 bits and bf16(col j + fs/2) in the high bits (round-to-nearest-
    even, matching ``jnp.astype(bfloat16)``).  Split-column packing keeps
    unpacking concat-shaped (see ``attach_edge_windows``)."""
    import sys

    import ml_dtypes
    # the device-side unpack ('<<16' = low half) assumes little-endian host
    # words; a big-endian host would silently swap the halves
    assert sys.byteorder == "little", "bf16 packing requires a little-endian host"
    f = feats.shape[1]
    if fs != f:
        feats = np.pad(feats, ((0, 0), (0, fs - f)))
    bits = feats.astype(ml_dtypes.bfloat16).view(np.uint16)
    lo, hi = bits[:, : fs // 2], bits[:, fs // 2:]
    words = lo.astype(np.uint32) | (hi.astype(np.uint32) << 16)
    return words.view(np.float32)


# chunk width of the on-device store build (bounds per-chunk temporaries)
_EWIN_BUILD_CHUNK = 4 * 1024 * 1024


@jax.jit
def _ewin_chunk(features, col, indptr, estart, degc, pos0):
    """One [_EWIN_BUILD_CHUNK] block of the flat store: for each output
    element position, locate its (node, slot, column) and gather the
    feature value; alignment-padding positions get 0.  (bf16 stores pass
    pre-packed f32 word tables — the build is dtype-oblivious.)"""
    f = features.shape[1]
    pos = pos0 + jax.lax.broadcasted_iota(
        jnp.int32, (_EWIN_BUILD_CHUNK, 1), 0)[:, 0]
    v = jnp.searchsorted(estart, pos, side="right").astype(jnp.int32) - 1
    v = jnp.clip(v, 0, estart.shape[0] - 1)
    off = pos - estart[v]
    slot = off // f
    c = off - slot * f
    valid = slot < degc[v]
    src = col[jnp.where(valid, indptr[v] + slot, 0)]
    vals = features[jnp.where(valid, src, 0), c]
    return jnp.where(valid, vals, jnp.float32(0))


# chunks per build call: the store is assembled by a python loop of
# donated in-place updates rather than one monolithic program — a single
# program emitting the multi-GB buffer proved fragile on the tunneled
# runtime at stress scale (worker crashes), and the loop also caps the
# transient footprint at one super-chunk
_EWIN_BUILD_SUPER = 32


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("nsub",))
def _ewin_superchunk(buf, features, col, indptr, estart, degc, p0,
                     nsub: int):
    starts = p0 + jnp.arange(nsub, dtype=jnp.int32) * _EWIN_BUILD_CHUNK
    blocks = jax.lax.map(
        lambda s0: _ewin_chunk(features, col, indptr, estart, degc, s0),
        starts)
    return jax.lax.dynamic_update_slice(
        buf, blocks.reshape(nsub * _EWIN_BUILD_CHUNK), (p0,))


def _ewin_build(features, col, indptr, estart, degc, *, f: int,
                length: int) -> jax.Array:
    ch = _EWIN_BUILD_CHUNK
    assert length % ch == 0, length
    nblk = length // ch
    buf = jnp.zeros((length,), jnp.float32)
    done = 0
    while done < nblk:
        nsub = min(_EWIN_BUILD_SUPER, nblk - done)
        buf = _ewin_superchunk(buf, features, col, indptr, estart, degc,
                               jnp.int32(done * ch), nsub)
        done += nsub
    return buf


def _round_up_arr(x: np.ndarray, m: int) -> np.ndarray:
    return ((x + m - 1) // m) * m


# sentinel-padded feature table budget: above this the per-step concat is
# cheaper than doubling a multi-GB feature table's footprint
FPAD_BUDGET_BYTES = 1536 * 1024 * 1024


def materialize_edge_windows(
        graph: MultiRelGraph, *,
        budget_bytes: int = EWIN_BUDGET_BYTES,
        total_budget_bytes: int = EWIN_TOTAL_BUDGET_BYTES,
        dtype=jnp.float32,
        fused: bool = True) -> MultiRelGraph:
    """Attach edge-window feature stores, biggest relations first (they
    dominate step time), until the total HBM budget is spent; also the
    homo graph (the GraphSAGE/GCN baselines aggregate over it), the packed
    per-node batch-constant table and the sentinel-padded feature table.
    Must run AFTER any feature transformation (e.g. the amazon
    row-normalize, ``model_handler.py:59``) — the stores snapshot the
    features.  ``dtype``: see ``attach_edge_windows`` (bfloat16 halves the
    step's dominant HBM traffic; the trainer defaults to it on TPU-first
    grounds, config key ``ewin_dtype``)."""
    feats = np.asarray(graph.features)
    remaining = total_budget_bytes
    rels = list(graph.relations)
    for i in sorted(range(len(rels)), key=lambda i: -rels[i].num_edges):
        r2 = attach_edge_windows(rels[i], feats,
                                 budget_bytes=min(budget_bytes, remaining),
                                 dtype=dtype)
        if r2.ewin is not None:
            remaining -= int(r2.ewin.size) * r2.ewin.dtype.itemsize
        rels[i] = r2
    rels = tuple(rels)
    homo = graph.homo
    shared = next((r for old, r in zip(graph.relations, rels)
                   if old is graph.homo), None)
    homo = shared if shared is not None else attach_edge_windows(
        homo, feats, budget_bytes=min(budget_bytes, remaining), dtype=dtype)
    fbytes = int(graph.features.size) * 4
    fpad = None
    if fbytes <= FPAD_BUDGET_BYTES:
        fpad = _row_major(jnp.concatenate(
            [graph.features,
             jnp.zeros((1, graph.features.shape[1]), graph.features.dtype)]))
    fused_arr, fused_w, fused_off = (
        _build_fused_store(rels, graph.num_nodes, remaining)
        if fused else (None, 0, ()))
    return MultiRelGraph(relations=rels, homo=homo,
                         features=graph.features, labels=graph.labels,
                         node_pack=_build_node_pack(rels, graph.features),
                         features_pad=fpad,
                         fused=fused_arr, fused_w=fused_w,
                         fused_off=fused_off)


# nodes per fused-store assembly chunk (bounds the [C, W] transient)
_FUSED_CHUNK = 2048


def _build_fused_store(rels, num_nodes: int, budget_bytes: int):
    """Assemble the fused per-node record store (``MultiRelGraph.fused``)
    from the relations' aligned edge-window stores, ON DEVICE.

    Row layout: fused[v] = concat over relations of
    store_r[estart_r[v] : estart_r[v] + dp_r] (each section already
    1024-aligned, so per chunk the copy is a wide row gather from the
    [L/1024, 1024] store view — no element gathers).  Eligibility: every
    relation carries an aligned store and the extra HBM fits the
    remaining budget.  Rows beyond num_nodes (chunk padding) duplicate
    the last node and are never addressed (batch ids < N).
    """
    if (not rels or num_nodes == 0
            or any(r.ewin is None or not r.ewin_aligned for r in rels)):
        return None, 0, ()
    # tight sections: the XLA row gather has no alignment requirement, so
    # each relation's section is its true window width rounded to the
    # 128-lane granule — NOT the per-relation store's 1024-aligned dp
    # (rel widths like 17 neighbors would pad 272 -> 1024 words and the
    # record fetch is bandwidth-bound)
    dps = [r.ewin_dp for r in rels]
    secs_w = [_round_up(max(r.window_width, 1)
                        * ((r.ewin_fs // 2) if r.ewin_packed else r.ewin_f),
                        128) for r in rels]
    w = int(sum(secs_w))
    # R+1 offsets (trailing total): section r spans [off[r], off[r+1])
    off = tuple(int(x) for x in np.cumsum([0] + secs_w))
    nblk = -(-num_nodes // _FUSED_CHUNK)
    n_rows = nblk * _FUSED_CHUNK
    if n_rows * w * 4 > budget_bytes:
        return None, 0, ()
    tables = [r.ewin.reshape(-1, 1024) for r in rels]
    estarts = [r.estart for r in rels]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk(buf, tables, estarts, i0):
        ids = i0 + jax.lax.broadcasted_iota(
            jnp.int32, (_FUSED_CHUNK, 1), 0)[:, 0]
        ids = jnp.minimum(ids, num_nodes - 1)
        secs = []
        for t, es, dp, sw in zip(tables, estarts, dps, secs_w):
            ridx = (es[ids] // 1024)[:, None] + jnp.arange(
                dp // 1024, dtype=jnp.int32)[None, :]
            secs.append(t[ridx].reshape(_FUSED_CHUNK, dp)[:, :sw])
        rec = jnp.concatenate(secs, axis=1)
        return jax.lax.dynamic_update_slice(buf, rec, (i0, 0))

    buf = jnp.zeros((n_rows, w), jnp.float32)
    for b in range(nblk):
        buf = chunk(buf, tables, estarts, jnp.int32(b * _FUSED_CHUNK))
    jax.block_until_ready(buf)
    return buf, w, off


def _row_major(a: jax.Array) -> jax.Array:
    """Force a freshly-built 2D table to a row-major device layout.

    ``concatenate(axis=1)`` outputs can land column-major on TPU; a
    per-call jit consuming such a table as an argument then relayouts the
    WHOLE table before its row gather (profiled: 82 us/call for the
    59 MB node_pack).  One on-device relayout at build time removes it.
    (Loop bodies hoist the copy, so this mainly cleans standalone-step
    paths: predict, roofline, SPMD predict.)
    """
    try:
        from jax.experimental.layout import Format, Layout
        return jax.device_put(a, Format(Layout((0, 1))))
    except Exception:  # pragma: no cover - older jax / exotic backends
        return a


def _build_node_pack(rels, features: jax.Array) -> jax.Array | None:
    """[N, F + 4R + sum D_r] packed batch-constant table (see
    ``MultiRelGraph.node_pack``), assembled ON DEVICE from the
    already-resident pieces (int columns bitcast through f32 — gathers
    move bits verbatim, consumers bitcast back)."""
    if not rels or any(r.meta is None or r.nbr2d is None for r in rels):
        return None
    as_f32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    cols = [features]
    cols += [as_f32(r.meta) for r in rels]
    cols += [as_f32(r.nbr2d) for r in rels]
    return _row_major(jnp.concatenate(cols, axis=1))


def rel_threshold(threshold, r) -> float:
    """Resolve a scalar-or-per-relation choose threshold.

    The reference keeps a per-relation ``thresholds`` list (fixed 0.5 each,
    ``src/layers.py:52,193``); configs here may pass either one float
    (``threshold``) or a list (``thresholds``).  ``r=None`` (the homo graph,
    which never runs choose) resolves a list to the 0.5 default.
    """
    if isinstance(threshold, (list, tuple)):
        return 0.5 if r is None else float(threshold[r])
    return float(threshold)
