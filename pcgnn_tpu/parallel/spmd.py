"""SPMD PC-GNN: data-parallel batches × edge/row-partitioned graph structure,
written with ``shard_map`` so the communication pattern is explicit
(SURVEY.md §2 "first-class components to add").

Layout over the ('data', 'graph') mesh:
  * batch / labels / weights : sharded over 'data'  -> [B/dd] per device
  * node features            : sharded over 'graph' -> [N_pad/dg, F]
  * graph structure          : sharded over 'graph' — each relation is a
    :class:`ShardedRel` whose dense neighbor table (``nbr2d``), per-node
    metadata and edge-window feature store are row-block partitioned, so
    per-device graph bytes are ~1/dg of the total.  The ONLY replicated
    structure is the hub sub-CSR of window-capped relations — the <0.5%
    of rows above the p99.5 degree cap (``graph.csr._window_cap``), whose
    edge mass is small by construction while the O(N·dcap) window tables
    (the dominant bytes) stay sharded.
  * params                   : replicated (they are KBs).

The step is *owner-computes-selection*; per relation one of three lanes:

  fast lane (relation carries a sharded edge-window store): the owner of a
    batch row gathers the row's contiguous feature window from its LOCAL
    store shard (``ops.pallas.window_gather`` — the same one-DMA-per-row
    kernel as single-chip), runs choose + window aggregation entirely
    locally, and publishes the finished (sum, count) with one
    exactly-one-owner ``psum``: O(B·F) comm, and the sharded step IS the
    single-chip fast path.

  plain lane (no store, e.g. over the HBM budget): the owner reads the
    neighbor window from its ``nbr2d`` shard, computes the keep mask from
    the all-gathered score table, and publishes the kept ids (O(B·D) int32
    psum); every device then contributes feature partials for kept ids in
    its block (``psum`` completes the mean).

  hub lane (rows with deg > dcap of a capped relation): the hub sub-CSR is
    replicated, so every device computes the identical blockwise choose
    sweep (scores are global after the all-gather) and contributes feature
    partials only for neighbors in its own block — comm stays O(B·F),
    compute is proportional to touched hub edges (``ops.hub`` semantics,
    dynamic trip counts).

Nodewise halo: one ``all_gather`` over 'graph' of the [N_pad] *selection*
score channel (skipped entirely when every relation runs the fast lane and
none has hubs — choose then scores the gathered windows directly).  Scores
follow the single-chip selection-precision rule: packed (bf16) stores rank
the bf16-rounded feature snapshot (``models.pcgnn`` sel_round).

Train-time oversampling: candidate selection is replicated (train-positive
scores come from an owner-pick psum of their feature rows); the per-row
keep-minor mask is owner-computed (it needs the kept-window dedup,
``src/layers.py:694``) and published, and candidate feature partials are
accumulated blockwise (``MINOR_CHUNK``) so wide candidate windows on skew
graphs never materialize [B, M, F] or [B, M, D] at once.  Hub rows'
minors are selected exactly in-chunk over the sorted candidate table
(``ops.hub.chunk_minor_band``; the graph-axis leader publishes the band).

Collectives are BATCHED (round 5; the r4 1x1 profile showed each psum
costing a shard_map program cut): one packed [Bd, 4R] owner-meta psum,
one packed keep-minor psum across fast lanes, one packed [Bd, R(F+1)]
output psum, and the relation-independent minor feature gather runs once
for all relations.  The fast lane can fetch all relations' windows with
ONE local row gather from the sharded fused record table
(:func:`build_sharded_fused`), and with dg > 1 the per-relation DMA
kernel skips non-owned rows entirely (predicated DMAs), so gather
traffic is O(B/dg · D · F) per device.

Loss: ``psum`` over the data axes inside the weighted CE mean; parameter
grads reduce through shard_map's transpose of the replicated-in broadcast.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcgnn_tpu.graph.csr import MultiRelGraph, RelGraph, _pack_bf16_pairs
from pcgnn_tpu.models.pcgnn import PCGNN
from pcgnn_tpu.ops.aggregate import (
    MINOR_CHUNK,
    dedup_minor_keep,
    keep_nearest,
    oversample_candidates_values,
    unpack_window,
)
from pcgnn_tpu.ops.hub import (HUB_BLOCK, HUB_CHUNK, _run_hub_chunks,
                               _window_block, keep_nearest_switch)

shard_map = jax.shard_map

_INF = float("inf")  # python float: keep imports free of backend init


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def data_axes(mesh: Mesh) -> tuple:
    """The batch-sharding axes of a mesh: ('data',) on single-host
    ('data','graph') meshes, ('dcn','data') on multi-host
    ('dcn','data','graph') meshes (see ``parallel.distributed``).  Batch
    arrays shard over all of them; the loss psum reduces over all of them
    — the 'dcn' hop is the only collective that crosses hosts besides the
    score all-gather."""
    return tuple(n for n in mesh.axis_names if n in ("dcn", "data"))


def _data_psum(mesh: Mesh):
    """Scalar psum over the data axes, an identity (elided at trace time)
    when their total extent is 1 — same specialization rule as
    :func:`_graph_collectives`."""
    daxes = data_axes(mesh)
    dsz = 1
    for a in daxes:
        dsz *= mesh.shape[a]
    if dsz == 1:
        return lambda v: v
    return lambda v: jax.lax.psum(v, daxes)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedRel:
    """One relation's structure, row-block sharded over the 'graph' axis.

    The dense window-lane neighbor table, the per-node degree vectors and
    (when built) the edge-window feature store are placed with
    P('graph', ...) shardings — every device hosts ~1/dg of those bytes.
    Rows are padded to ``n_pad`` (zero degree, sentinel neighbors).

    Window-capped relations additionally carry a compact hub sub-CSR
    (``hub_*``), REPLICATED on every device: the full neighbor lists of
    the few rows above the cap, plus a sharded [N_pad] ``hub_idx`` map
    (-1 for non-hub rows) the owner publishes per batch.
    """

    nbr2d: jax.Array    # [N_pad, D] int32, P('graph', None); pad slots = N
    deg: jax.Array      # [N_pad] int32, P('graph')
    keff: jax.Array     # [N_pad] int32, P('graph')
    ksample: jax.Array  # [N_pad] int32, P('graph')
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    ksample_max: int = dataclasses.field(default=0,
                                         metadata=dict(static=True))
    # max ksample over window-lane rows (deg <= width); sizes the compact
    # minor window (hub rows select minors in-chunk — RelGraph.ksample_cap)
    ksample_cap: int = dataclasses.field(default=0,
                                         metadata=dict(static=True))
    dmax: int = dataclasses.field(default=0, metadata=dict(static=True))
    # hub sub-CSR (window-capped relations only; replicated)
    hub_idx: jax.Array | None = None    # [N_pad] int32, P('graph'); -1 = not hub
    hub_start: jax.Array | None = None  # [H_pad] int32 into hub_col, P()
    hub_col: jax.Array | None = None    # [Eh_pad] int32, P(); pad = N
    hub_deg: jax.Array | None = None    # [H_pad] int32, P()
    hub_keff: jax.Array | None = None   # [H_pad] int32, P()
    hub_ksample: jax.Array | None = None  # [H_pad] int32, P()
    # sharded edge-window feature store (fast lane): dg equal-length block
    # segments concatenated, each block's node runs 1024-aligned and
    # offsets LOCAL to the block
    ewin: jax.Array | None = None       # [dg * Lb] f32, P('graph')
    estart: jax.Array | None = None     # [N_pad] int32 LOCAL offsets, P('graph')
    ewin_dp: int = dataclasses.field(default=0, metadata=dict(static=True))
    ewin_f: int = dataclasses.field(default=0, metadata=dict(static=True))
    ewin_fs: int = dataclasses.field(default=0, metadata=dict(static=True))
    ewin_packed: bool = dataclasses.field(default=False,
                                          metadata=dict(static=True))

    @property
    def has_hubs(self) -> bool:
        return self.hub_col is not None


def pad_graph_for_mesh(graph: MultiRelGraph, mesh: Mesh):
    """Pad the feature table so its rows divide the 'graph' axis; returns
    (features_padded [N_pad, F] placed with a sharded layout, N_pad)."""
    dg = mesh.shape["graph"]
    n = graph.num_nodes
    n_pad = ((n + dg - 1) // dg) * dg
    feats = graph.features
    if n_pad != n:
        feats = jnp.concatenate(
            [feats, jnp.zeros((n_pad - n, feats.shape[1]), feats.dtype)])
    feats = jax.device_put(feats, NamedSharding(mesh, P("graph", None)))
    return feats, n_pad


# sharded edge-window store budget (bytes ACROSS the mesh; each device
# hosts 1/dg).  Relations whose store would exceed it run the plain lane.
SPMD_EWIN_BUDGET_BYTES = 8 * 1024 * 1024 * 1024


def shard_relation(rel: RelGraph, mesh: Mesh, n_pad: int,
                   features: np.ndarray | None = None,
                   *, edge_windows: bool = True,
                   ewin_dtype=jnp.float32,
                   ewin_budget_bytes: int = SPMD_EWIN_BUDGET_BYTES
                   ) -> ShardedRel:
    """Row-block partition one relation over the mesh's 'graph' axis.

    The dense [N, D] window-lane neighbor table (D = dcap; hub rows keep
    only their first dcap slots here, their full lists go to the hub
    sub-CSR) plus deg/keff/ksample become 'graph'-sharded device arrays.
    With ``features`` and ``edge_windows``, the per-block edge-window
    feature store is built too (``ewin_dtype`` as in
    ``graph.csr.attach_edge_windows``), enabling the fast lane.
    """
    if rel.is_stub:
        raise ValueError("cannot shard a degree-only stub relation "
                         "(graph.csr.degree_stub): it has no edges")
    dg = mesh.shape["graph"]
    n, d = rel.num_nodes, max(rel.window_width, 1)
    indptr = np.asarray(rel.indptr)
    col = np.asarray(rel.col[: rel.num_edges])
    deg_np = np.asarray(rel.deg)
    if rel.nbr2d is not None:
        nbr2d = np.asarray(rel.nbr2d)
    else:
        # beyond the single-chip table budget: build on host, shard on put
        nbr2d = np.full((n, d), n, dtype=np.int32)
        if len(col):
            rows = np.repeat(np.arange(n), np.diff(indptr))
            slots = np.arange(len(col)) - indptr[rows]
            fit = slots < d
            nbr2d[rows[fit], slots[fit]] = col[fit]
    if n_pad != n:
        pad = np.full((n_pad - n, d), n, dtype=np.int32)
        nbr2d = np.concatenate([nbr2d, pad])

    def padvec(v, fill=0):
        v = np.asarray(v)
        return np.concatenate([v, np.full(n_pad - n, fill, v.dtype)])

    put = lambda a, spec: jax.device_put(
        np.asarray(a), NamedSharding(mesh, spec))

    hub_kw = {}
    if rel.has_hubs:
        hub_kw = _build_hub_shard(rel, indptr, col, deg_np, n, n_pad, put,
                                  padvec)
    ewin_kw = {}
    if edge_windows and features is not None:
        ewin_kw = _build_sharded_ewin(rel, indptr, col, deg_np, features,
                                      dg, n_pad, ewin_dtype,
                                      ewin_budget_bytes, put)

    return ShardedRel(
        nbr2d=put(nbr2d, P("graph", None)),
        deg=put(padvec(deg_np), P("graph")),
        keff=put(padvec(rel.keff), P("graph")),
        ksample=put(padvec(rel.ksample), P("graph")),
        num_nodes=n,
        width=d,
        ksample_max=rel.ksample_max,
        ksample_cap=rel.ksample_cap,
        dmax=rel.dmax,
        **hub_kw,
        **ewin_kw,
    )


def _build_hub_shard(rel, indptr, col, deg_np, n, n_pad, put, padvec):
    """Compact hub sub-CSR (full neighbor lists of rows above the cap),
    replicated, plus the sharded node -> hub-slot map."""
    d = max(rel.window_width, 1)
    hub_rows = np.flatnonzero(deg_np > d)
    h = len(hub_rows)
    h_pad = max(_round_up(h, 8), 8)
    hub_deg = np.zeros(h_pad, np.int32)
    hub_deg[:h] = deg_np[hub_rows]
    hub_keff = np.zeros(h_pad, np.int32)
    hub_keff[:h] = np.asarray(rel.keff)[hub_rows]
    hub_ks = np.zeros(h_pad, np.int32)
    hub_ks[:h] = np.asarray(rel.ksample)[hub_rows]
    hub_start = np.zeros(h_pad, np.int64)
    np.cumsum(hub_deg[:-1], out=hub_start[1:])
    total = int(hub_start[h - 1] + hub_deg[h - 1]) if h else 0
    # tail pad mirrors graph.csr._finalize so the ragged block gather can
    # DMA the 1024-aligned superset of any [start, start + HUB_BLOCK) span
    eh_pad = max(_round_up(total + _round_up(HUB_BLOCK, 1024) + 2048, 1024),
                 1024)
    hub_col = np.full(eh_pad, n, np.int32)
    for i, v in enumerate(hub_rows):
        s = int(hub_start[i])
        hub_col[s: s + deg_np[v]] = col[indptr[v]: indptr[v] + deg_np[v]]
    hub_idx = np.full(n, -1, np.int32)
    hub_idx[hub_rows] = np.arange(h, dtype=np.int32)
    return dict(
        hub_idx=put(padvec(hub_idx, fill=-1), P("graph")),
        hub_start=put(hub_start.astype(np.int32), P()),
        hub_col=put(hub_col, P()),
        hub_deg=put(hub_deg, P()),
        hub_keff=put(hub_keff, P()),
        hub_ksample=put(hub_ks, P()),
    )


def _build_sharded_ewin(rel, indptr, col, deg_np, features, dg, n_pad,
                        dtype, budget_bytes, put):
    """Per-block edge-window store: node v's first min(deg, dcap) neighbor
    feature rows in CSR order, runs 1024-aligned, offsets local to v's
    block; the dg equal-length blocks concatenate into one P('graph')
    array (see ``graph.csr.attach_edge_windows`` for the packing rules).
    Built on the host (numpy): the sharded layout re-bases offsets per
    block, and multi-host pods would build their addressable blocks only.
    """
    dtype = jnp.dtype(dtype)
    packed = dtype == jnp.dtype(jnp.bfloat16)
    feats = np.asarray(features, np.float32)
    f = feats.shape[1]
    fs = f + (f % 2) if packed else f
    fw = fs // 2 if packed else fs
    d = max(rel.window_width, 1)
    dp = _round_up(d * fw, 1024)
    block = n_pad // dg
    degc = np.minimum(deg_np, d).astype(np.int64)
    degc_pad = np.concatenate([degc, np.zeros(n_pad - len(degc), np.int64)])
    runs = ((degc_pad * fw + 1023) // 1024) * 1024   # 1024-aligned runs
    # per-block local starts + the common (max) block length
    runs_blk = runs.reshape(dg, block)
    estart_blk = np.zeros((dg, block), np.int64)
    np.cumsum(runs_blk[:, :-1], axis=1, out=estart_blk[:, 1:])
    block_lens = estart_blk[:, -1] + runs_blk[:, -1]
    lb = _round_up(int(block_lens.max()) + dp + 3072, 1024)
    if lb * dg * 4 > budget_bytes:
        return {}
    if packed:
        feats = _pack_bf16_pairs(feats, fs)        # [N, fw] packed words
    flat = np.zeros(dg * lb, np.float32)
    n = len(deg_np)
    for g in range(dg):
        lo, hi = g * block, min((g + 1) * block, n)
        if lo >= n:
            break
        nodes = np.arange(lo, hi)
        cnt = degc[lo:hi]
        rows = np.repeat(nodes, cnt)
        if not len(rows):
            continue
        starts_rep = np.repeat(estart_blk[g, : hi - lo], cnt)
        slot = np.arange(len(rows)) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        src = col[indptr[rows] + slot]
        dst = (g * lb + starts_rep + slot * fw)[:, None] + np.arange(fw)
        flat[dst.ravel()] = feats[src].ravel()
    estart_local = estart_blk.reshape(-1).astype(np.int32)
    return dict(
        ewin=put(flat, P("graph")),
        estart=put(estart_local, P("graph")),
        ewin_dp=dp,
        ewin_f=f,
        ewin_fs=fs,
        ewin_packed=packed,
    )


def build_sharded_fused(graph: MultiRelGraph, shards: tuple, mesh: Mesh,
                        n_pad: int, *,
                        budget_bytes: int = SPMD_EWIN_BUDGET_BYTES):
    """[N_pad, W] fused per-node record table, row-block sharded.

    The single-chip step fetches EVERY relation's neighbor-feature window
    with ONE 2D row gather per batch node (``graph.csr._build_fused_store``
    — the r4 profile showed the per-relation window DMAs dispatch-bound);
    the round-5 1x1-overhead profile showed the sharded fast lane paying
    the same per-relation dispatch cost again.  This builds the identical
    record layout host-side (tight 128-lane sections, same packing as the
    relations' sharded stores) and shards its ROWS over 'graph', so the
    owner's record fetch is one XLA row gather from its local block —
    byte-identical values to the per-relation stores.

    Returns (fused [N_pad, W] P('graph', None), off tuple) or (None, ())
    when any relation lacks a sharded store or the table busts the budget.
    """
    rels = graph.relations
    if (not rels or any(sh.ewin is None for sh in shards)):
        return None, ()
    feats = np.asarray(graph.features, np.float32)
    secs_w = [
        _round_up(max(sh.width, 1)
                  * ((sh.ewin_fs // 2) if sh.ewin_packed else sh.ewin_f),
                  128) for sh in shards]
    w = int(sum(secs_w))
    off = tuple(int(x) for x in np.cumsum([0] + secs_w))
    if n_pad * w * 4 > budget_bytes:
        return None, ()
    buf = np.zeros((n_pad, w), np.float32)
    for rel, sh, sw, col0 in zip(rels, shards, secs_w, off[:-1]):
        fw = (sh.ewin_fs // 2) if sh.ewin_packed else sh.ewin_f
        fp = (_pack_bf16_pairs(feats, sh.ewin_fs) if sh.ewin_packed
              else feats)
        indptr = np.asarray(rel.indptr)
        col = np.asarray(rel.col)[: rel.num_edges]
        d = max(sh.width, 1)
        degc = np.minimum(np.diff(indptr), d).astype(np.int64)
        rows = np.repeat(np.arange(rel.num_nodes), degc)
        if not len(rows):
            continue
        starts = np.concatenate([[0], np.cumsum(degc)[:-1]])
        slot = np.arange(int(degc.sum())) - np.repeat(starts, degc)
        src = col[indptr[rows] + slot]
        flat = buf.reshape(-1)
        flat_idx = ((rows.astype(np.int64) * w + col0 + slot * fw)[:, None]
                    + np.arange(fw))
        flat[flat_idx.ravel()] = np.asarray(fp, np.float32)[src].ravel()
    fused = jax.device_put(buf, NamedSharding(mesh, P("graph", None)))
    return fused, off


def shard_relations(graph: MultiRelGraph, mesh: Mesh, n_pad: int,
                    *, edge_windows: bool = True,
                    ewin_dtype=jnp.float32,
                    ewin_budget_bytes: int = SPMD_EWIN_BUDGET_BYTES) -> tuple:
    feats = (np.asarray(graph.features)
             if edge_windows and graph.num_relations else None)
    return tuple(
        shard_relation(r, mesh, n_pad, feats, edge_windows=edge_windows,
                       ewin_dtype=ewin_dtype,
                       ewin_budget_bytes=ewin_budget_bytes)
        for r in graph.relations)


def _owner_pick(mine, values, axis="graph"):
    """psum-broadcast of per-row values each held by exactly one owner
    device (rows where ``mine`` is False contribute zero)."""
    z = jnp.where(mine if values.ndim == 1 else mine[:, None], values, 0)
    return jax.lax.psum(z, axis)


def _graph_collectives(dg: int):
    """(psum_g, owner_pick) over the 'graph' axis, specialized at TRACE
    time for ``dg == 1`` meshes (pure data-parallel — a production
    configuration, not just the overhead bench's degenerate case): a
    collective over a size-1 axis is an identity, and skipping it lets
    XLA fuse what the shard_map program would otherwise materialize
    around self-copies.  The dg == 1 owner_pick keeps the zeroing of
    non-owned rows (bit-identical values, e.g. invalid train_pos rows),
    only the psum is elided."""
    if dg == 1:
        return (lambda v: v), (lambda mine, values: jnp.where(
            mine if values.ndim == 1 else mine[:, None], values, 0))
    return (lambda v: jax.lax.psum(v, "graph")), _owner_pick


def _block_partials(ids, keep, col_lo, block, x_local):
    """Gather-based partial sums over this device's feature-row block:
    (partial_num [B, F], partial_cnt [B]) for the kept ids in the block.
    Scatter-free (see ``ops.aggregate.window_mean_aggregate``)."""
    local = ids - col_lo
    in_block = keep & (local >= 0) & (local < block)
    w = in_block.astype(x_local.dtype)
    xg = x_local[jnp.clip(local, 0, block - 1)]
    num = jnp.einsum("bd,bdf->bf", w, xg)
    return num, jnp.sum(w, axis=-1)


def _block_partials_chunked(ids, keep, col_lo, block, x_local,
                            chunk: int = MINOR_CHUNK):
    """``_block_partials`` in fixed-width column blocks: peak memory stays
    O(B·chunk·F) for wide candidate windows (skew graphs grow the minor
    window with ceil(thr·dmax)·rho, ``src/layers.py:681``).  Selection is
    non-differentiable, so the block loop needs no VJP."""
    b, m = ids.shape
    if m <= chunk:
        return _block_partials(ids, keep, col_lo, block, x_local)
    ids = jax.lax.stop_gradient(ids)
    keep = jax.lax.stop_gradient(keep)
    nblk = -(-m // chunk)
    if nblk * chunk != m:
        ids = jnp.pad(ids, ((0, 0), (0, nblk * chunk - m)))
        keep = jnp.pad(keep, ((0, 0), (0, nblk * chunk - m)))
    f = x_local.shape[1]

    def body(j, acc):
        num, cnt = acc
        idb = jax.lax.dynamic_slice(ids, (0, j * chunk), (b, chunk))
        kb = jax.lax.dynamic_slice(keep, (0, j * chunk), (b, chunk))
        pn, pc = _block_partials(idb, kb, col_lo, block, x_local)
        return num + pn, cnt + pc

    return jax.lax.fori_loop(
        0, nblk, body, (jnp.zeros((b, f), x_local.dtype),
                        jnp.zeros((b,), x_local.dtype)))


def _block_partials_chunked_multi(ids, keeps, col_lo, block, x_local,
                                  chunk: int = MINOR_CHUNK):
    """``_block_partials_chunked`` for SEVERAL relations sharing one
    candidate window: the chunked block-local feature gather — the
    dominant, relation-independent cost — runs ONCE per chunk and each
    relation contracts it with its own keep mask (the SPMD twin of
    ``ops.aggregate.minor_sum_compact_multi``).

    Returns ``[(num [B, F], cnt [B]), ...]``, one pair per keep mask.
    """
    b, m = ids.shape
    f = x_local.shape[1]
    ids = jax.lax.stop_gradient(ids)
    keeps = [jax.lax.stop_gradient(k) for k in keeps]
    if m <= chunk:
        local = ids - col_lo
        in_block = (local >= 0) & (local < block)
        xg = x_local[jnp.clip(local, 0, block - 1)]
        out = []
        for keep in keeps:
            w = (in_block & keep).astype(x_local.dtype)
            out.append((jnp.einsum("bd,bdf->bf", w, xg),
                        jnp.sum(w, axis=-1)))
        return out
    nblk = -(-m // chunk)
    if nblk * chunk != m:
        ids = jnp.pad(ids, ((0, 0), (0, nblk * chunk - m)))
        keeps = [jnp.pad(k, ((0, 0), (0, nblk * chunk - m))) for k in keeps]

    def body(j, acc):
        idb = jax.lax.dynamic_slice(ids, (0, j * chunk), (b, chunk))
        local = idb - col_lo
        in_block = (local >= 0) & (local < block)
        xg = x_local[jnp.clip(local, 0, block - 1)]
        out = []
        for (num, cnt), k_all in zip(acc, keeps):
            kb = jax.lax.dynamic_slice(k_all, (0, j * chunk), (b, chunk))
            w = (in_block & kb).astype(x_local.dtype)
            out.append((num + jnp.einsum("bd,bdf->bf", w, xg),
                        cnt + jnp.sum(w, axis=-1)))
        return tuple(out)

    zero = tuple((jnp.zeros((b, f), x_local.dtype),
                  jnp.zeros((b,), x_local.dtype)) for _ in keeps)
    return list(jax.lax.fori_loop(0, nblk, body, zero))


def _spmd_hub_sum(sh: ShardedRel, is_hub, hslot, s0_full, center_s0,
                  x_local, col_lo, block, f: int,
                  tp_local=None, minor_ctx=None, labels=None,
                  rho: float = 0.5):
    """Blockwise choose + feature-partial sum over hub rows (the SPMD form
    of ``ops.hub.hub_choose_sum``).

    The hub sub-CSR is replicated and scores are global, so every device
    in a 'graph' group runs the IDENTICAL selection sweep (same dynamic
    trip counts); only the feature accumulation is device-local (neighbors
    in this block), so one psum of the returned partials completes the
    sums.  ``tp_local`` ([block] 0/1 train-positive indicator for this
    block) enables the duplicate-minor subtraction; the weight of a
    duplicate is only ever subtracted by the device that added it (the
    neighbor's block owner), matching the single-chip global subtraction.

    ``minor_ctx`` = (sp_sorted, slot_sorted, feats_sorted) — all
    REPLICATED (candidate scores/features come from owner-pick psums) —
    enables the exact in-chunk minor band (``ops.hub.chunk_minor_band``);
    every device computes the identical band, and only the graph-axis
    leader folds it into its partials so the completing psum counts it
    once.

    Returns device-local partials (num [B, f], cnt [B]); zeros at non-hub
    rows.
    """
    from pcgnn_tpu.ops.hub import chunk_minor_band

    sg = jax.lax.stop_gradient
    x_local = sg(x_local)
    center_s0 = sg(center_s0)
    s0_full = sg(s0_full)
    if minor_ctx is not None:
        minor_ctx = tuple(sg(a) for a in minor_ctx)
        lead = jax.lax.axis_index("graph") == 0
    blk = HUB_BLOCK
    dh = _round_up(max(sh.dmax, 1), blk)
    h_pad = sh.hub_deg.shape[0]
    n_pad = s0_full.shape[0]

    def chunk_fn(rows_slot, active):
        hs = jnp.clip(hslot[rows_slot], 0, h_pad - 1)
        start = sh.hub_start[hs]
        deg = jnp.where(active & (hslot[rows_slot] >= 0), sh.hub_deg[hs], 0)
        kf_rows = sh.hub_keff[hs]
        c_s0 = center_s0[rows_slot]
        thr = None
        mnum = mcnt = None
        if minor_ctx is not None:
            mnum, mcnt, thr = chunk_minor_band(
                c_s0, sh.hub_ksample[hs], labels[rows_slot] == 1,
                active, *minor_ctx, rho)
        jb = (jnp.max(deg) + blk - 1) // blk       # dynamic trip count

        def pass1(j, dist):
            nbr = _window_block(sh.hub_col, start, j, blk)
            offs = j * blk + jnp.arange(blk, dtype=jnp.int32)[None, :]
            v = offs < deg[:, None]
            s0n = s0_full[jnp.clip(nbr, 0, n_pad - 1)]
            d_ = jnp.where(v, jnp.abs(c_s0[:, None] - s0n), _INF)
            return jax.lax.dynamic_update_slice(dist, d_, (0, j * blk))

        dist = jax.lax.fori_loop(
            0, jb, pass1, jnp.full((HUB_CHUNK, dh), _INF, jnp.float32))
        keep = keep_nearest_switch(dist, kf_rows, jb, blk)

        def pass2(j, acc):
            num, cnt = acc
            nbr = _window_block(sh.hub_col, start, j, blk)
            local = nbr - col_lo
            inb = (local >= 0) & (local < block)
            lclip = jnp.clip(local, 0, block - 1)
            kb = jax.lax.dynamic_slice(keep, (0, j * blk), (HUB_CHUNK, blk))
            w = (kb & inb).astype(x_local.dtype)
            if tp_local is not None and thr is not None:
                db = jax.lax.dynamic_slice(dist, (0, j * blk),
                                           (HUB_CHUNK, blk))
                dup = kb & inb & (tp_local[lclip] > 0.5) & (db <= thr[:, None])
                w = w - dup.astype(x_local.dtype)
            num = num + jnp.einsum("hw,hwf->hf", w, x_local[lclip])
            return num, cnt + jnp.sum(w, axis=1)

        num, cnt = jax.lax.fori_loop(
            0, jb, pass2, (jnp.zeros((HUB_CHUNK, f), x_local.dtype),
                           jnp.zeros((HUB_CHUNK,), x_local.dtype)))
        if mnum is not None:
            # replicated band; the leader's partials carry it exactly once
            num = num + jnp.where(lead, mnum, 0.0)
            cnt = cnt + jnp.where(lead, mcnt, 0.0)
        return num, cnt

    deg_o = jnp.where(is_hub, sh.hub_deg[jnp.clip(hslot, 0, h_pad - 1)], 0)
    return _run_hub_chunks(is_hub, HUB_CHUNK, f, x_local.dtype, chunk_fn,
                           deg=deg_o)


def _sharded_feature_window(sh: ShardedRel, starts: jax.Array,
                            mine: jax.Array | None = None):
    """[B, D, F] feature window from this device's LOCAL store shard (one
    contiguous DMA per row, ``ops.pallas.window_gather``); rows this
    device does not own issue NO DMA (``mine`` is the kernel's active
    mask) and read garbage the caller masks out — per-device gather
    traffic is O(owned rows · D · F), so the fast lane's dominant stage
    weak-scales over the 'graph' axis (VERDICT r4 Weak #4)."""
    from pcgnn_tpu.ops.pallas import window_gather
    d = max(sh.width, 1)
    raw = window_gather.window_gather(sh.ewin, starts, sh.ewin_dp,
                                      aligned=True, active=mine)
    return unpack_window(raw, d, sh.ewin_f, sh.ewin_fs, sh.ewin_packed)


def spmd_forward_fn(model: PCGNN, mesh: Mesh, n_pad: int, shards: tuple,
                    *, train: bool, fused_off: tuple = ()):
    """Build the shard_map'd forward
    (params, x_local, shards, fused, batch, tp, tpv, y) ->
    (gnn_logits [Bd, C], center_scores [Bd, C]), both 'data'-sharded.

    Math identical to ``models.pcgnn.PCGNN.forward`` (parity-tested); see
    the module docstring for the communication schedule.  ``y`` (labels)
    is consumed only when ``train`` (fraud-center oversampling).

    ``fused`` is the row-sharded fused record table
    (:func:`build_sharded_fused`; pass a [N_pad, 0] placeholder with
    ``fused_off=()`` to disable): when present, the owner fetches ALL
    relations' windows with ONE local row gather, mirroring the
    single-chip fused path.

    ``shards`` (the actual :class:`ShardedRel` tuple) is needed at build
    time only to derive the in_specs pytree (static fields must match);
    the arrays still enter as traced arguments, not closed-over literals.
    """
    block = n_pad // mesh.shape["graph"]
    dg = mesh.shape["graph"]
    rho = model.rho
    daxes = data_axes(mesh)
    psum_g, owner_pick = _graph_collectives(dg)
    use_fused = bool(fused_off)
    # selection-precision rule (models.pcgnn sel_round): packed stores
    # rank the bf16-rounded feature snapshot everywhere
    packed_sel = any(sh.ewin_packed for sh in shards)
    sel = ((lambda a: a.astype(jnp.bfloat16).astype(jnp.float32))
           if packed_sel else (lambda a: a))
    # the [N_pad] selection-score all-gather is needed by the plain lane
    # (scores of nbr2d ids) and the hub lane; all-fast-lane graphs skip it
    need_table = any(sh.ewin is None or sh.has_hubs for sh in shards)

    def rel_spec(sh):
        rep = dict(nbr2d=P("graph", None), deg=P("graph"), keff=P("graph"),
                   ksample=P("graph"))
        if sh.has_hubs:
            rep.update(hub_idx=P("graph"), hub_start=P(), hub_col=P(),
                       hub_deg=P(), hub_keff=P(), hub_ksample=P())
        if sh.ewin is not None:
            rep.update(ewin=P("graph"), estart=P("graph"))
        return dataclasses.replace(sh, **rep)

    shards_spec = tuple(rel_spec(sh) for sh in shards)

    def body(params, x_local, shards, fused, batch, train_pos,
             train_pos_valid, y):
        clf = params["label_clf"]
        w0 = jax.lax.stop_gradient(clf["w"][:, 0])
        b0 = jax.lax.stop_gradient(clf["b"][0])
        col_lo = jax.lax.axis_index("graph") * block
        local = batch - col_lo
        mine = (local >= 0) & (local < block)
        lclip = jnp.clip(local, 0, block - 1)

        if use_fused:
            # one local row gather fetches every relation's window for
            # the owned batch rows (single-chip fused-record path)
            rec = fused[lclip]                                 # [Bd, W]

        # self feature rows, reduced over the graph axis
        self_feats = owner_pick(mine, x_local[lclip])          # [Bd, F]
        center_scores = jnp.dot(self_feats, clf["w"], precision="highest",
                                preferred_element_type=jnp.float32) + clf["b"]

        def s0_of(rows):
            return jnp.dot(jax.lax.stop_gradient(sel(rows)), w0,
                           precision="highest",
                           preferred_element_type=jnp.float32) + b0

        # selection is non-differentiable (label_clf learns only through
        # the similarity loss, src/model.py:54-61)
        center_s0 = jax.lax.stop_gradient(s0_of(self_feats))   # [Bd]
        if need_table:
            # dg == 1: this device's block IS the whole table
            s0_full = (s0_of(x_local) if dg == 1 else jax.lax.all_gather(
                s0_of(x_local), "graph", axis=0, tiled=True))  # [N_pad]

        if train:
            # candidate selection is replicated: train-positive feature
            # rows via one owner-pick psum, scored with the shared rule
            tp_local = train_pos - col_lo
            tp_mine = (tp_local >= 0) & (tp_local < block) & train_pos_valid
            tp_feats = owner_pick(tp_mine, x_local[jnp.clip(
                tp_local, 0, block - 1)])                      # [P, F]
            tp_s0 = s0_of(tp_feats)
            m_max = model.minor_window(int(train_pos.shape[0]), shards)
            cand_ids, cand_valid, _, _ = oversample_candidates_values(
                center_s0, tp_s0, train_pos, train_pos_valid, m_max)
            is_fraud = (y == 1)
            any_hub = any(sh.has_hubs for sh in shards)
            if any_hub:
                # this block's train-positive indicator (hub dup detection)
                tp_rows = jnp.where(tp_mine, jnp.clip(tp_local, 0, block - 1),
                                    block)
                tp_blockmask = jnp.zeros(
                    (block + 1,), x_local.dtype).at[tp_rows].set(
                        1.0, mode="drop")[:block]
                # score-sorted candidate table for the hub minor band
                # (chunk_minor_band) — tp_feats/tp_s0 are replicated, so
                # the sort is identical on every device
                spv = jnp.where(train_pos_valid, tp_s0, _INF)
                slot0 = jnp.arange(spv.shape[0], dtype=jnp.int32)
                sp_sorted, slot_sorted = jax.lax.sort((spv, slot0),
                                                      num_keys=1)
                feats_sorted = jax.lax.stop_gradient(tp_feats)[slot_sorted]
                minor_ctx = (sp_sorted, slot_sorted, feats_sorted)

        # ---- owner metadata: ONE packed psum for ALL relations --------- #
        # (one [Bd, 4] psum per relation was measured as part of the +28%
        # 1x1 structural overhead, VERDICT r4 Weak #3/#4)
        cols = []
        for sh in shards:
            cols += [sh.deg[lclip], sh.keff[lclip], sh.ksample[lclip],
                     (sh.hub_idx[lclip] if sh.has_hubs
                      else jnp.zeros_like(lclip))]
        meta_all = owner_pick(mine, jnp.stack(cols, axis=1))   # [Bd, 4R]

        rel_sums = []    # per relation (num, cnt, pending keep_minor)
        km_defer = []    # (index into rel_sums, owner-local km) fast lanes
        for r, sh in enumerate(shards):
            d = sh.width
            meta = meta_all[:, 4 * r: 4 * r + 4]
            deg_b, keff_b, ks_b, hslot = (meta[:, 0], meta[:, 1],
                                          meta[:, 2], meta[:, 3])
            is_hub = (deg_b > d) if sh.has_hubs else None
            offs = jax.lax.broadcasted_iota(
                jnp.int32, (batch.shape[0], d), 1)
            valid_w = offs < jnp.minimum(deg_b, d)[:, None]
            if sh.has_hubs:
                valid_w = valid_w & ~is_hub[:, None]   # hubs leave the window

            if train:
                m = jnp.floor(ks_b.astype(jnp.float32) * rho).astype(
                    jnp.int32)
                slot = jax.lax.broadcasted_iota(
                    jnp.int32, cand_valid.shape, 1)
                base_minor = cand_valid & (slot < m[:, None]) & is_fraud[:, None]
                if sh.has_hubs:
                    # hub rows' minors are selected + summed in the hub
                    # lane (exact band over the sorted candidate table)
                    base_minor = base_minor & ~is_hub[:, None]

            if sh.ewin is not None:
                # ---- fast lane: owner-complete window choose + sum ----- #
                if use_fused:
                    raw = rec[:, fused_off[r]: fused_off[r + 1]]
                    xw = unpack_window(raw, d, sh.ewin_f, sh.ewin_fs,
                                       sh.ewin_packed)         # [Bd, D, F]
                else:
                    starts = sh.estart[lclip]
                    # dg == 1: every row is owned — the masked
                    # (predicated-DMA) kernel and the NaN scrub would be
                    # pure overhead
                    xw = _sharded_feature_window(
                        sh, starts, mine if dg > 1 else None)  # [Bd, D, F]
                    if dg > 1:
                        # skipped-DMA rows hold uninitialized VMEM: zero
                        # them so 0-weight contractions cannot propagate
                        # a stray NaN
                        xw = jnp.where(mine[:, None, None], xw, 0.0)
                valid_o = mine[:, None] & valid_w
                nbr_s0 = s0_of(xw)
                dist = jnp.where(valid_o,
                                 jnp.abs(center_s0[:, None] - nbr_s0), _INF)
                keep = keep_nearest(dist, keff_b, valid_o)
                kf = keep.astype(xw.dtype)
                num = jnp.einsum("bd,bdf->bf", kf, xw)
                cnt = jnp.sum(kf, axis=1)
                if train:
                    # owner dedups minors against its kept window; the
                    # publish psums are BATCHED into one collective below
                    nbr_ids = sh.nbr2d[lclip]
                    km = dedup_minor_keep(nbr_ids, keep, n_pad, cand_ids,
                                          base_minor & mine[:, None])
                    km_defer.append((r, km))
                    keep_minor = None
            else:
                # ---- plain lane: publish kept ids, partial-sum features -- #
                nbr_mine = sh.nbr2d[lclip]                     # [Bd, D]
                valid_o = mine[:, None] & valid_w
                dist = jnp.abs(center_s0[:, None] - s0_full[jnp.clip(
                    nbr_mine, 0, n_pad - 1)])
                dist = jnp.where(valid_o, dist, _INF)
                keep = keep_nearest(dist, keff_b, valid_o)
                enc = jnp.where(keep, nbr_mine + 1, 0)         # 0 = not kept
                enc = psum_g(enc)                              # [Bd, D]
                kept_ids = enc - 1
                kept = enc > 0
                num, cnt = _block_partials(kept_ids, kept, col_lo, block,
                                           x_local)
                if train:
                    # kept ids are global here, so dedup replicates exactly
                    keep_minor = dedup_minor_keep(
                        kept_ids, kept, n_pad, cand_ids, base_minor)

            if sh.has_hubs:
                h_num, h_cnt = _spmd_hub_sum(
                    sh, is_hub, hslot, s0_full, center_s0, x_local,
                    col_lo, block, x_local.shape[1],
                    tp_local=tp_blockmask if train else None,
                    minor_ctx=minor_ctx if train else None,
                    labels=y if train else None, rho=rho)
                num, cnt = num + h_num, cnt + h_cnt   # disjoint row sets

            rel_sums.append([num, cnt, keep_minor if train else None])

        if train and km_defer:
            # ---- ONE psum publishes every fast lane's keep-minor mask -- #
            m_w = cand_ids.shape[1]
            packed = jnp.concatenate(
                [km.astype(jnp.int32) for _, km in km_defer], axis=1)
            packed = psum_g(packed) > 0
            for j, (r, _) in enumerate(km_defer):
                rel_sums[r][2] = packed[:, j * m_w: (j + 1) * m_w]

        if train:
            # ---- minors: ONE chunked feature gather, R contractions ---- #
            # (the [B, chunk, F] block gather is relation-independent —
            # same win as ops.aggregate.minor_sum_compact_multi)
            parts = _block_partials_chunked_multi(
                cand_ids, [st[2] for st in rel_sums], col_lo, block, x_local)
            rel_sums = [[num + mn, cnt + mc, None]
                        for (num, cnt, _), (mn, mc) in zip(rel_sums, parts)]

        # ---- ONE packed psum completes every relation's sums ----------- #
        f = x_local.shape[1]
        packed = jnp.concatenate(
            [jnp.concatenate([num, cnt[:, None]], axis=1)
             for num, cnt, _ in rel_sums], axis=1)             # [Bd, R(F+1)]
        packed = psum_g(packed)

        rel_embs = []
        for r in range(len(shards)):
            num = packed[:, r * (f + 1): r * (f + 1) + f]
            cnt = packed[:, r * (f + 1) + f]
            agg = num / jnp.maximum(cnt, 1.0)[:, None]
            cat = jnp.concatenate([self_feats, agg], axis=1)
            h = jax.nn.relu(jnp.dot(cat, params["intra"][r]["w"],
                                    preferred_element_type=jnp.float32))
            rel_embs.append(h)

        cat_all = jnp.concatenate([self_feats] + rel_embs, axis=1)
        combined = jax.nn.relu(jnp.dot(cat_all, params["inter"]["w"],
                                       preferred_element_type=jnp.float32))
        gnn_logits = jnp.dot(combined, params["head"]["w"],
                             preferred_element_type=jnp.float32)
        return gnn_logits, center_scores

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("graph", None), shards_spec, P("graph", None),
                  P(daxes), P(), P(), P(daxes)),
        out_specs=(P(daxes), P(daxes)),
        check_vma=False,
    )


def _spmd_hub_mean(sh: ShardedRel, is_hub, hslot, x_local, col_lo, block,
                   f: int, batch, include_self: bool):
    """Blockwise all-neighbor mean partials over hub rows — the SPMD form
    of ``ops.hub.hub_mean_sum`` (GraphSAGE/GCN baselines; no choose).

    The hub sub-CSR is replicated, so every device sweeps the identical
    full neighbor lists (same ``has_self`` outcome) and contributes
    feature partials only for neighbors in its own block; the conditional
    self row is added by the row's block owner exactly once.
    """
    x_local = jax.lax.stop_gradient(x_local)
    blk = HUB_BLOCK
    h_pad = sh.hub_deg.shape[0]

    def chunk_fn(rows_slot, active):
        rows = batch[rows_slot]
        hs = jnp.clip(hslot[rows_slot], 0, h_pad - 1)
        start = sh.hub_start[hs]
        deg = jnp.where(active & (hslot[rows_slot] >= 0), sh.hub_deg[hs], 0)
        jb = (jnp.max(deg) + blk - 1) // blk

        def body(j, acc):
            num, cnt, has_self = acc
            nbr = _window_block(sh.hub_col, start, j, blk)
            offs = j * blk + jnp.arange(blk, dtype=jnp.int32)[None, :]
            v = offs < deg[:, None]
            local = nbr - col_lo
            inb = (local >= 0) & (local < block)
            w = (v & inb).astype(x_local.dtype)
            num = num + jnp.einsum("hw,hwf->hf", w,
                                   x_local[jnp.clip(local, 0, block - 1)])
            has_self = has_self | jnp.any(v & (nbr == rows[:, None]), axis=1)
            return num, cnt + jnp.sum(w, axis=1), has_self

        num, cnt, has_self = jax.lax.fori_loop(
            0, jb, body, (jnp.zeros((HUB_CHUNK, f), x_local.dtype),
                          jnp.zeros((HUB_CHUNK,), x_local.dtype),
                          jnp.zeros((HUB_CHUNK,), bool)))
        if include_self:
            self_local = rows - col_lo
            self_inb = (self_local >= 0) & (self_local < block)
            miss = ((~has_self) & self_inb).astype(x_local.dtype)
            num = num + miss[:, None] * x_local[
                jnp.clip(self_local, 0, block - 1)]
            cnt = cnt + miss
        return num, cnt

    h_deg = sh.hub_deg[jnp.clip(hslot, 0, h_pad - 1)]
    return _run_hub_chunks(is_hub, HUB_CHUNK, f, x_local.dtype, chunk_fn,
                           deg=jnp.where(is_hub, h_deg, 0))


def spmd_homo_forward_fn(model, mesh: Mesh, n_pad: int, sh: ShardedRel,
                         *, train: bool):
    """shard_map'd forward for the homo-graph baselines (GraphSAGE/GCN).

    (params, x_local, sh, batch, key) -> logits [Bd, C] ('data'-sharded).
    Math identical to ``models.graphsage.GraphSage.forward`` /
    ``models.gcn.GCN._aggregate`` (no choose/minors — one owner-computes
    window-mean lane + the hub lane): self-loop union, mean (SAGE,
    ``src/graphsage.py:78-96``) or sqrt-rowsum (GCN,
    ``src/graphsage.py:210-226``) normalization, optional uniform neighbor
    subsampling (``num_sample``, replicated key so every device samples
    identically).
    """
    from pcgnn_tpu.models.gcn import GCN

    block = n_pad // mesh.shape["graph"]
    dg = mesh.shape["graph"]
    daxes = data_axes(mesh)
    psum_g, owner_pick = _graph_collectives(dg)
    is_gcn = isinstance(model, GCN)
    norm = "sqrt" if is_gcn else "mean"
    gcn_style = True if is_gcn else model.gcn_style
    num_sample = None if is_gcn else model.num_sample
    if num_sample is not None and sh.has_hubs:
        raise ValueError(
            "GraphSage num_sample subsampling draws uniformly from the "
            "FULL neighbor list (src/graphsage.py:70-76), which a "
            "window-capped relation cannot expose; rebuild the graph "
            "with window_cap disabled or drop num_sample.")

    def rel_spec(s):
        rep = dict(nbr2d=P("graph", None), deg=P("graph"), keff=P("graph"),
                   ksample=P("graph"))
        if s.has_hubs:
            rep.update(hub_idx=P("graph"), hub_start=P(), hub_col=P(),
                       hub_deg=P(), hub_keff=P(), hub_ksample=P())
        if s.ewin is not None:
            rep.update(ewin=P("graph"), estart=P("graph"))
        return dataclasses.replace(s, **rep)

    def body(params, x_local, sh, batch, key):
        d = sh.width
        f = x_local.shape[1]
        col_lo = jax.lax.axis_index("graph") * block
        local = batch - col_lo
        mine = (local >= 0) & (local < block)
        lclip = jnp.clip(local, 0, block - 1)

        self_feats = owner_pick(mine, x_local[lclip])          # [Bd, F]
        cols = [sh.deg[lclip],
                (sh.hub_idx[lclip] if sh.has_hubs else jnp.zeros_like(lclip))]
        meta = owner_pick(mine, jnp.stack(cols, axis=1))
        deg_b, hslot = meta[:, 0], meta[:, 1]
        is_hub = (deg_b > d) if sh.has_hubs else None
        offs = jax.lax.broadcasted_iota(jnp.int32, (batch.shape[0], d), 1)
        valid_w = offs < jnp.minimum(deg_b, d)[:, None]
        if sh.has_hubs:
            valid_w = valid_w & ~is_hub[:, None]

        nbr_mine = sh.nbr2d[lclip]                             # [Bd, D]
        valid_o = mine[:, None] & valid_w
        if num_sample is not None:
            # replicated key -> identical priorities on every device; only
            # the owner's valid slots participate (reference random.sample,
            # src/graphsage.py:70-76)
            pri = jax.random.uniform(key, valid_w.shape)
            pri = jnp.where(valid_w, pri, _INF)
            rank = jnp.argsort(jnp.argsort(pri, axis=1, stable=True),
                               axis=1, stable=True)
            valid_o = valid_o & (rank < num_sample)

        if sh.ewin is not None:
            # fast lane: the owner reads its local store windows
            xw = _sharded_feature_window(
                sh, sh.estart[lclip], mine if dg > 1 else None)
            if dg > 1:
                # skipped-DMA rows hold uninitialized VMEM: zero them so
                # 0-weight contractions cannot propagate a stray NaN
                xw = jnp.where(mine[:, None, None], xw, 0.0)
            kf = valid_o.astype(xw.dtype)
            num = jnp.einsum("bd,bdf->bf", kf, xw)
            cnt = jnp.sum(kf, axis=1)
            if gcn_style:
                present = jnp.any((nbr_mine == batch[:, None]) & valid_o,
                                  axis=1)
                addself = mine & ~present
                if sh.has_hubs:
                    addself = addself & ~is_hub
                w_self = addself.astype(xw.dtype)
                num = num + w_self[:, None] * self_feats
                cnt = cnt + w_self
        else:
            # plain lane: publish kept ids, partial-sum features per block
            enc = jnp.where(valid_o, nbr_mine + 1, 0)
            enc = psum_g(enc)
            kept_ids, kept = enc - 1, enc > 0
            num, cnt = _block_partials(kept_ids, kept, col_lo, block,
                                       x_local)
            if gcn_style:
                present = jnp.any(kept & (kept_ids == batch[:, None]), axis=1)
                addself = ~present
                if sh.has_hubs:
                    addself = addself & ~is_hub
                pn, pc = _block_partials(batch[:, None], addself[:, None],
                                         col_lo, block, x_local)
                num, cnt = num + pn, cnt + pc

        if sh.has_hubs:
            h_num, h_cnt = _spmd_hub_mean(sh, is_hub, hslot, x_local,
                                          col_lo, block, f, batch,
                                          include_self=gcn_style)
            num, cnt = num + h_num, cnt + h_cnt

        num = psum_g(num)
        cnt = psum_g(cnt)
        denom = jnp.maximum(cnt, 1.0)
        if norm == "sqrt":
            denom = jnp.sqrt(denom)
        neigh = num / denom[:, None]
        combined = (neigh if gcn_style
                    else jnp.concatenate([self_feats, neigh], axis=1))
        embeds = jax.nn.relu(jnp.dot(combined, params["enc"]["w"],
                                     preferred_element_type=jnp.float32))
        logits = jnp.dot(embeds, params["head"]["w"],
                         preferred_element_type=jnp.float32)
        return logits

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("graph", None), rel_spec(sh), P(daxes), P()),
        out_specs=P(daxes),
        check_vma=False,
    )


def spmd_homo_loss_fn(model, mesh: Mesh, n_pad: int, sh: ShardedRel):
    """loss(params, x_sharded, sh, batch, y, w, key) -> scalar weighted-mean
    CE over the data axes (``src/graphsage.py:36-39,176-178``)."""
    fwd = spmd_homo_forward_fn(model, mesh, n_pad, sh, train=True)
    daxes = data_axes(mesh)
    psum_d = _data_psum(mesh)

    def mean_over_data(ce, w):
        num = psum_d(jnp.sum(ce * w))
        den = psum_d(jnp.sum(w))
        return num / jnp.maximum(den, 1.0)

    reduce_ = shard_map(mean_over_data, mesh=mesh,
                        in_specs=(P(daxes), P(daxes)), out_specs=P(),
                        check_vma=False)

    def loss(params, x_sharded, sh, batch, y, w, key):
        logits = fwd(params, x_sharded, sh, batch, key)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return reduce_(ce, w)

    return loss


def spmd_homo_predict_fn(model, mesh: Mesh, n_pad: int, sh: ShardedRel):
    """probs(params, x_sharded, sh, batch) — softmax for SAGE
    (``src/graphsage.py:33-35`` as practiced), sigmoid for GCN
    (``src/graphsage.py:172-174``)."""
    from pcgnn_tpu.models.gcn import GCN

    fwd = spmd_homo_forward_fn(model, mesh, n_pad, sh, train=False)
    act = jax.nn.sigmoid if isinstance(model, GCN) else (
        lambda z: jax.nn.softmax(z, axis=-1))

    # replicated output: every process of a multi-host mesh holds the full
    # [B, 2] result, so the host-side metric code needs no process gather
    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def predict(params, x_sharded, sh, batch):
        return act(fwd(params, x_sharded, sh, batch, jax.random.key(0)))

    return predict


def _fused_placeholder(mesh: Mesh, n_pad: int) -> jax.Array:
    """Zero-width stand-in for the fused record table (0 bytes; safe to
    close over) so the shard_map arity is fixed whether or not the caller
    built one."""
    return jax.device_put(jnp.zeros((n_pad, 0), jnp.float32),
                          NamedSharding(mesh, P("graph", None)))


def spmd_loss_fn(model: PCGNN, mesh: Mesh, n_pad: int, shards: tuple,
                 *, fused_off: tuple = ()):
    """loss(params, x_sharded, shards, batch, y, w, tp, tpv[, fused]) ->
    scalar.

    Joint weighted-mean CE, reduced over the 'data' axis
    (``src/model.py:47-62``; weights mask padded batch slots).  With
    ``fused_off`` (and the matching :func:`build_sharded_fused` table
    passed as the trailing ``fused`` argument) the fast lane fetches all
    relations' windows in one local row gather."""
    fwd = spmd_forward_fn(model, mesh, n_pad, shards, train=True,
                          fused_off=fused_off)
    daxes = data_axes(mesh)
    psum_d = _data_psum(mesh)
    placeholder = _fused_placeholder(mesh, n_pad)

    def mean_over_data(ce_joint, w):
        num = psum_d(jnp.sum(ce_joint * w))
        den = psum_d(jnp.sum(w))
        return num / jnp.maximum(den, 1.0)

    reduce_ = shard_map(mean_over_data, mesh=mesh,
                        in_specs=(P(daxes), P(daxes)), out_specs=P(),
                        check_vma=False)

    def loss(params, x_sharded, shards, batch, y, w, train_pos,
             train_pos_valid, fused=None):
        gnn_logits, center_scores = fwd(
            params, x_sharded, shards,
            placeholder if fused is None else fused, batch,
            train_pos, train_pos_valid, y)
        ce_gnn = optax.softmax_cross_entropy_with_integer_labels(gnn_logits, y)
        ce_lab = optax.softmax_cross_entropy_with_integer_labels(
            center_scores, y)
        return reduce_(ce_gnn + model.alpha * ce_lab, w)

    return loss


def spmd_predict_fn(model: PCGNN, mesh: Mesh, n_pad: int, shards: tuple,
                    *, fused_off: tuple = ()):
    """probs(params, x_sharded, shards, batch, tp, tpv[, fused]) -> [B, 2]
    sigmoid of the GNN head (``src/model.py:41-45``), gathered to the
    host."""
    fwd = spmd_forward_fn(model, mesh, n_pad, shards, train=False,
                          fused_off=fused_off)
    placeholder = _fused_placeholder(mesh, n_pad)

    # replicated output: every process of a multi-host mesh holds the full
    # [B, 2] result, so the host-side metric code needs no process gather
    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def predict(params, x_sharded, shards, batch, train_pos,
                train_pos_valid, fused=None):
        gnn_logits, _ = fwd(params, x_sharded, shards,
                            placeholder if fused is None else fused, batch,
                            train_pos, train_pos_valid,
                            jnp.zeros_like(batch))
        return jax.nn.sigmoid(gnn_logits)

    return predict


def make_spmd_train_step(model: PCGNN, mesh: Mesh,
                         tx: optax.GradientTransformation,
                         x_sharded: jax.Array, shards: tuple, n_pad: int,
                         *, fused=None, fused_off: tuple = ()):
    """Jitted SPMD step: (params, opt_state, batch, y, w, tp, tpv) ->
    (params, opt_state, loss)."""
    loss_fn = spmd_loss_fn(model, mesh, n_pad, shards, fused_off=fused_off)

    @partial(jax.jit, donate_argnums=(0, 1))
    def _step(params, opt_state, x_sharded, shards, fused, batch, y, w,
              train_pos, train_pos_valid):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, x_sharded, shards, batch, y, w,
                              train_pos, train_pos_valid, fused))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params, opt_state, batch, y, w, train_pos, train_pos_valid):
        return _step(params, opt_state, x_sharded, shards, fused, batch,
                     y, w, train_pos, train_pos_valid)

    return step


def shard_batch(mesh: Mesh, *arrays):
    """Place batch-axis arrays with a data-axes-sharded layout (works for
    both single-host and ('dcn',...) multi-host meshes; every process must
    pass the same full array)."""
    spec = P(data_axes(mesh))
    out = [jax.device_put(a, NamedSharding(mesh, spec)) for a in arrays]
    return out if len(out) > 1 else out[0]
