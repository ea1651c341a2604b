"""Node-partitioned distributed SpMM.

The full graph's rows are sharded across the mesh; each device aggregates
its own rows.  Three feature layouts:

* ``replicated`` — features live on every device (small/medium graphs);
  zero communication in the hot loop.
* ``gather``      — features sharded by node; an ``all_gather`` over ICI
  reassembles them before local aggregation.
* ``halo``        — features sharded by node; each device sends only the
  boundary rows each peer actually references (``all_to_all`` on
  precomputed per-peer index lists), the graph analog of context
  parallelism.  Communication volume is Σ|halo| instead of D·n — on
  locality-ordered partitions this is the scalable layout.

This is a new design — the reference is single-device only
(SURVEY.md §2.10).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from graphslim_tpu import graph as G


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RowPartition:
    """Edge lists per shard, padded to a common length.

    ``row_local[s, e]`` is the row index *within shard s*; padded slots
    carry ``val = 0`` so they contribute nothing.  Registered pytree
    with static shape metadata so the whole container can cross ``jit``
    boundaries (e.g. inside :class:`DistAdj`).
    """

    row_local: jax.Array   # [S, E_max] int32
    col: jax.Array         # [S, E_max] int32 (global)
    val: jax.Array         # [S, E_max] float32
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))
    n_rows: int = dataclasses.field(metadata=dict(static=True))


def partition_rows(adj: G.SparseAdj, n_shards: int) -> RowPartition:
    """Host-side contiguous row partition with per-shard edge padding."""
    n = adj.n_rows
    rows_per = -(-n // n_shards)
    row = np.asarray(adj.row)
    col = np.asarray(adj.col)
    val = np.asarray(adj.values_or_ones())
    indptr = np.asarray(adj.indptr)
    counts = []
    for s in range(n_shards):
        lo = min(s * rows_per, n)
        hi = min((s + 1) * rows_per, n)
        counts.append(int(indptr[hi] - indptr[lo]))
    e_max = max(max(counts), 1)
    rl = np.zeros((n_shards, e_max), dtype=np.int32)
    cl = np.zeros((n_shards, e_max), dtype=np.int32)
    vl = np.zeros((n_shards, e_max), dtype=np.float32)
    for s in range(n_shards):
        lo = min(s * rows_per, n)
        hi = min((s + 1) * rows_per, n)
        a, b = int(indptr[lo]), int(indptr[hi])
        m = b - a
        rl[s, :m] = row[a:b] - lo
        cl[s, :m] = col[a:b]
        vl[s, :m] = val[a:b]
    return RowPartition(jnp.asarray(rl), jnp.asarray(cl), jnp.asarray(vl),
                        rows_per, n)


def edge_cut_order(adj: G.SparseAdj, n_shards: int, slack: float = 0.02,
                   passes: int = 10) -> np.ndarray:
    """Node permutation grouping a balanced min-edge-cut partition.

    Multilevel heavy-edge-matching partitioner (``native.partition_graph``
    — C++, the house style for host graph algorithms); falls back to
    reverse-Cuthill–McKee bandwidth reduction without the native
    library.  Apply the returned order to the graph (and features), then
    contiguous row partitions align with the partition parts — halo
    volume drops from O(n) (random/RCM order, VERDICT r2: 303 % of n on
    the pubmed twin) to the partition boundary (measured 45 % of n at 8
    shards, docs/PERF.md round 3).
    """
    from graphslim_tpu import native

    indptr = np.asarray(adj.indptr)
    col = np.asarray(adj.col)
    res = native.partition_graph(indptr, col, n_shards, slack=slack,
                                 passes=passes)
    if res is not None:
        part, _ = res
        return np.argsort(part, kind="stable")
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = adj.n_rows
    csr = sp.csr_matrix(
        (np.ones_like(col, dtype=np.float32),
         (np.repeat(np.arange(n), np.diff(indptr)), col)), shape=(n, n))
    return np.asarray(reverse_cuthill_mckee(csr, symmetric_mode=True))


def reorder_adj(adj: G.SparseAdj, order: np.ndarray) -> G.SparseAdj:
    """Relabel nodes of ``adj`` so ``order[i]`` becomes node ``i``."""
    n = adj.n_rows
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    return G.from_edge_index(
        np.stack([inv[np.asarray(adj.row)], inv[np.asarray(adj.col)]]),
        n, edge_weight=np.asarray(adj.values_or_ones()), dedup=False)


class HaloPartition(NamedTuple):
    """Row partition plus halo-exchange routing tables.

    ``send_idx[s, d, h]`` — owner-local row indices shard *s* must send to
    shard *d* (padded with 0; padding is harmless because padded edge
    slots carry ``val = 0``).  ``col_halo[s, e]`` — each edge's column
    remapped into the post-``all_to_all`` receive buffer of its shard:
    ``src_shard * H + position``.
    """

    base: RowPartition
    send_idx: jax.Array    # [S, S, H] int32 (sender-major)
    col_halo: jax.Array    # [S, E_max] int32
    halo_size: int         # H


def partition_rows_halo(adj: G.SparseAdj, n_shards: int) -> HaloPartition:
    """Host-side halo routing: per (src, dst) the unique boundary rows."""
    base = partition_rows(adj, n_shards)
    D, rows_per = n_shards, base.rows_per_shard
    col = np.asarray(base.col)
    uniq_lists: list[list[np.ndarray]] = []   # [dst][src]
    H = 1
    for d in range(D):
        owners = col[d] // rows_per
        local_pos = col[d] % rows_per
        per_src = []
        for s in range(D):
            # columns owned by this shard are read locally, not exchanged
            uniq = (np.zeros(0, np.int64) if s == d
                    else np.unique(local_pos[owners == s]))
            per_src.append(uniq)
            H = max(H, len(uniq))
        uniq_lists.append(per_src)
    send_idx = np.zeros((D, D, H), dtype=np.int32)
    col_halo = np.zeros_like(col, dtype=np.int32)
    for d in range(D):
        owners = col[d] // rows_per
        local_pos = col[d] % rows_per
        remap = np.zeros(col.shape[1], dtype=np.int32)
        for s in range(D):
            m = owners == s
            if s == d:
                # own columns index the local block appended after the
                # D*H receive region
                remap[m] = D * H + local_pos[m]
                continue
            uniq = uniq_lists[d][s]
            send_idx[s, d, : len(uniq)] = uniq
            # position of each referenced column within the uniq list
            remap[m] = s * H + np.searchsorted(uniq, local_pos[m])
        col_halo[d] = remap
    return HaloPartition(base, jnp.asarray(send_idx),
                         jnp.asarray(col_halo), H)


def shard_spmm_halo(mesh: Mesh, hp: HaloPartition, x: jax.Array,
                    axis: str = "data") -> jax.Array:
    """Distributed A @ x with boundary-only feature exchange."""
    part = hp.base
    rows_per = part.rows_per_shard
    n_shards = part.row_local.shape[0]
    H = hp.halo_size

    def local(row_l, col_h, val, sidx, xs):
        row_l, col_h, val, sidx = row_l[0], col_h[0], val[0], sidx[0]
        send = jnp.take(xs, sidx.reshape(-1), axis=0).reshape(
            n_shards, H, xs.shape[-1])
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                                  tiled=True)
        flat = jnp.concatenate(
            [recv.reshape(n_shards * H, xs.shape[-1]), xs])
        gathered = jnp.take(flat, col_h, axis=0) * val[:, None]
        return jax.ops.segment_sum(gathered, row_l,
                                   num_segments=rows_per)[None]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))
    pad = n_shards * rows_per - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[-1]), x.dtype)])
    out = fn(part.row_local, hp.col_halo, part.val, hp.send_idx, x)
    return out.reshape(-1, x.shape[-1])[: part.n_rows]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RaggedHaloPartition:
    """Halo routing with per-pair exact sizes (no global pair-max pad),
    edges pre-split into **interior** and **boundary** segments.

    The padded layout (:class:`HaloPartition`) pads every (src, dst)
    pair to the global max halo ``H`` — one dense pair inflates the
    ``[S, S, H]`` buffer everywhere (VERDICT r2 weak #2, skew-fragile).
    Here each sender packs its per-destination boundary rows back to
    back, and the receive buffer is **round-major**: the chunk arriving
    from ``src`` lands at the static offset of round ``r = (dst - src)
    mod S``, each round padded only to that round's max size.  The same
    tables drive two exchanges:

    * ``jax.lax.ragged_all_to_all`` (TPU) — moves exactly
      ``sizes[s, d]`` rows per pair;
    * ``S - 1`` ``ppermute`` rounds (portable; XLA:CPU has no
      ragged-all-to-all) — moves ``round_max[r]`` rows per round.

    Buffer padding is Σ_r max_s sizes[s, (s+r) % S] — per-round max,
    not global pair max, so one dense pair only inflates its own round.

    The interior/boundary split (VERDICT r3 item 1, BASELINE north-star
    "overlapped with local aggregation"): ``(row_int, col_int, val_int)``
    are the edges whose column is owned locally — their gather +
    segment-sum reads only the local feature shard, with **no data
    dependence on the exchange**, so XLA's latency-hiding scheduler can
    run it while the all-to-all is in flight.  ``(row_bnd, col_bnd,
    val_bnd)`` are the cut edges; ``col_bnd`` indexes straight into the
    round-major receive buffer.  Each list is padded per-shard with
    ``val = 0`` slots.
    """

    base: RowPartition
    send_flat: jax.Array     # [S, L_max] int32 owner-local rows, packed
    in_offsets: jax.Array    # [S, S] int32: sender-local chunk starts
    send_sizes: jax.Array    # [S, S] int32 (sender-major [src, dst])
    out_offsets: jax.Array   # [S, S] int32: round-major remote offsets
    recv_sizes: jax.Array    # [S, S] int32 (receiver-major [dst, src])
    row_int: jax.Array       # [S, Ei] int32 shard-local row
    col_int: jax.Array       # [S, Ei] int32 shard-local column
    val_int: jax.Array       # [S, Ei] float32
    row_bnd: jax.Array       # [S, Eb] int32 shard-local row
    col_bnd: jax.Array       # [S, Eb] int32 into the receive buffer
    val_bnd: jax.Array       # [S, Eb] float32
    send_max: int = dataclasses.field(metadata=dict(static=True))
    recv_len: int = dataclasses.field(metadata=dict(static=True))
    # static per-round chunk sizes, len S-1
    round_max: tuple = dataclasses.field(metadata=dict(static=True))


def partition_rows_halo_ragged(adj: G.SparseAdj,
                               n_shards: int) -> RaggedHaloPartition:
    """Host-side ragged halo routing tables with interior/boundary split."""
    base = partition_rows(adj, n_shards)
    D, rows_per = n_shards, base.rows_per_shard
    col = np.asarray(base.col)
    row_l = np.asarray(base.row_local)
    val = np.asarray(base.val)
    # uniq[d][s]: owner-local rows of shard s referenced by shard d
    uniq: list[list[np.ndarray]] = []
    for d in range(D):
        owners = col[d] // rows_per
        local_pos = col[d] % rows_per
        uniq.append([
            (np.zeros(0, np.int64) if s == d
             else np.unique(local_pos[owners == s]))
            for s in range(D)])
    sizes = np.array([[len(uniq[d][s]) for d in range(D)]
                      for s in range(D)], dtype=np.int32)  # [src, dst]
    L_max = max(int(sizes.sum(axis=1).max()), 1)
    # round-major receive layout: chunk from src s at receiver d sits in
    # round r = (d - s) mod D at static offset base[r]
    round_max = tuple(
        max(int(max(sizes[s, (s + r) % D] for s in range(D))), 1)
        for r in range(1, D))
    base_off = np.zeros(D, dtype=np.int32)       # base_off[r], r=1..D-1
    acc = 0
    for r in range(1, D):
        base_off[r] = acc
        acc += round_max[r - 1]
    R_len = max(acc, 1)
    send_flat = np.zeros((D, L_max), dtype=np.int32)
    in_off = np.zeros((D, D), dtype=np.int32)
    out_off = np.zeros((D, D), dtype=np.int32)
    for s in range(D):
        pos = 0
        for d in range(D):
            c = int(sizes[s, d])
            in_off[s, d] = pos
            out_off[s, d] = base_off[(d - s) % D]
            if c:
                send_flat[s, pos:pos + c] = uniq[d][s]
            pos += c
    # split each shard's edge list into interior (column owned locally)
    # and boundary (column arrives through the exchange) segments
    ints, bnds = [], []   # per-shard (row, col, val) triples
    for d in range(D):
        owners = col[d] // rows_per
        local_pos = col[d] % rows_per
        m_int = owners == d
        ints.append((row_l[d][m_int], local_pos[m_int], val[d][m_int]))
        m_bnd = ~m_int
        remap = np.zeros(int(m_bnd.sum()), dtype=np.int32)
        ob, rb, vb = (local_pos[m_bnd], row_l[d][m_bnd], val[d][m_bnd])
        own_b = owners[m_bnd]
        for s in range(D):
            if s == d:
                continue
            m = own_b == s
            remap[m] = base_off[(d - s) % D] + np.searchsorted(
                uniq[d][s], ob[m])
        bnds.append((rb, remap, vb))
    Ei = max(max(len(t[0]) for t in ints), 1)
    Eb = max(max(len(t[0]) for t in bnds), 1)

    def _pad(triples, width):
        r = np.zeros((D, width), dtype=np.int32)
        c = np.zeros((D, width), dtype=np.int32)
        v = np.zeros((D, width), dtype=np.float32)
        for d, (rr, cc, vv) in enumerate(triples):
            m = len(rr)
            r[d, :m], c[d, :m], v[d, :m] = rr, cc, vv
        return jnp.asarray(r), jnp.asarray(c), jnp.asarray(v)

    ri, ci, vi = _pad(ints, Ei)
    rb_, cb, vb_ = _pad(bnds, Eb)
    return RaggedHaloPartition(
        base, jnp.asarray(send_flat), jnp.asarray(in_off),
        jnp.asarray(sizes), jnp.asarray(out_off),
        jnp.asarray(np.ascontiguousarray(sizes.T)),
        ri, ci, vi, rb_, cb, vb_, L_max, int(R_len), round_max)


_RAGGED_A2A_OK: dict = {}


def _ragged_a2a_supported(mesh: Mesh, axis: str) -> bool:
    """One compile probe per backend: XLA:CPU lacks ragged-all-to-all."""
    key = (mesh.devices.ravel()[0].platform, int(mesh.devices.size))
    if key not in _RAGGED_A2A_OK:
        # The probe must actually EXECUTE to report support.  Under an
        # outer jit trace it would be staged into the outer program
        # instead (never raising here, then failing the outer compile) —
        # in that case conservatively use the portable ppermute path for
        # this call and leave the cache unset.
        from jax._src import core as _core
        if not _core.trace_state_clean():
            return False
        D = int(mesh.devices.size)
        try:
            # Shape-faithful to the production call (ADVICE r3): each
            # shard passes [D]-length offset/size tables (the op
            # requires table length divisible by the axis size), and the
            # probe MOVES ONE REAL ROW PER PAIR — an all-zero-sizes
            # probe gets dead-code-eliminated and reports support on
            # backends whose runtime then rejects the op (observed on
            # XLA:CPU: compile fine, execute 'not supported by
            # ThunkEmitter').  Every shard sends row d to shard d, which
            # stores it at output offset = source rank; the result is
            # checked so the collective cannot be elided.
            z = jnp.tile(jnp.arange(D, dtype=jnp.float32)[None, :, None],
                         (D, 1, 1))                       # z[s, d] = d
            ioff = jnp.tile(jnp.arange(D, dtype=jnp.int32)[None],
                            (D, 1))                       # chunk d at d
            ones = jnp.ones((D, D), jnp.int32)
            ooff = jnp.tile(jnp.arange(D, dtype=jnp.int32)[:, None],
                            (1, D))                       # land at src

            def probe(zz, io, oo, ss):
                out = jnp.zeros((D, 1), jnp.float32)
                return jax.lax.ragged_all_to_all(
                    zz[0], out, io[0], ss[0], oo[0], ss[0],
                    axis_name=axis)[None]

            got = np.asarray(jax.block_until_ready(shard_map(
                probe, mesh=mesh, in_specs=(P(axis),) * 4,
                out_specs=P(axis))(z, ioff, ooff, ones)))
            # shard d receives its own rank from every source s, stored
            # at offset s: got[d, s] == d
            want = np.tile(np.arange(D, dtype=np.float32)[:, None, None],
                           (1, D, 1))
            _RAGGED_A2A_OK[key] = bool(np.array_equal(got, want))
        except Exception:
            _RAGGED_A2A_OK[key] = False
    return _RAGGED_A2A_OK[key]


def shard_spmm_halo_ragged(mesh: Mesh, hp: RaggedHaloPartition,
                           x: jax.Array, axis: str = "data",
                           use_ragged: bool | None = None,
                           padded: bool = False) -> jax.Array:
    """Distributed A @ x with the boundary exchange **overlapped** with
    interior aggregation (BASELINE north-star).

    Boundary rows move with per-pair exact (ragged-all-to-all) or
    per-round-max (ppermute rounds) sizes.  The interior partial sum
    (edges whose column is owned locally) has no data dependence on the
    exchange: on TPU, XLA's latency-hiding scheduler lowers the
    collective to an async start/done pair and schedules the interior
    gather + segment-sum between them, hiding the ICI latency behind
    local compute.  Boundary edges are finished from the receive buffer
    and added in — no ``[recv | local]`` concatenation is ever
    materialized (that copy alone cost ~rows_per·d per call in the
    round-3 fused layout).

    ``padded=True`` is the steady-state calling convention: ``x`` is
    ``[S*rows_per, d]`` and the result stays in that domain.  The
    convenience pad/crop of the default path are *unsharded* ops on the
    mesh — the SPMD partitioner turns each into a mesh-wide reshard
    (measured +280 ms per call at pubmed/8-virtual-dev scale, ~60 % of
    total; docs/PERF.md round 4) — so multi-layer callers pad once
    (:meth:`DistAdj.pad_features`) and stay padded across layers.
    """
    part = hp.base
    rows_per = part.rows_per_shard
    D = part.row_local.shape[0]
    R_len = hp.recv_len
    round_max = hp.round_max
    if use_ragged is None:
        # Overlap-first default (benchmark/probe_overlap_aot.py, compiled
        # v5e 2x4 schedule): current XLA lowers ragged-all-to-all
        # SYNCHRONOUSLY, while the ppermute rounds decompose into async
        # collective-permute-start/done pairs with the interior
        # aggregation scheduled inside the window — the ppermute rounds
        # (still driven by the ragged per-round-max tables) are the
        # exchange that actually overlaps.  Opt into the bytes-exact
        # wire format with use_ragged=True; revisit when XLA grows
        # async ragged-all-to-all.
        use_ragged = False

    def local(ri, ci, vi, rb, cb, vb, sflat, ioff, ssz, ooff, rsz, xs):
        dfeat = xs.shape[-1]
        send = jnp.take(xs, sflat[0], axis=0)           # [L_max, d]
        if use_ragged:
            out_buf = jnp.zeros((R_len, dfeat), xs.dtype)
            recv = jax.lax.ragged_all_to_all(
                send, out_buf, ioff[0], ssz[0], ooff[0], rsz[0],
                axis_name=axis)
        else:
            me = jax.lax.axis_index(axis)
            pad_rows = max(round_max) if round_max else 1
            send_ext = jnp.concatenate(
                [send, jnp.zeros((pad_rows, dfeat), xs.dtype)])
            parts = []
            for r in range(1, D):
                dst = (me + r) % D
                start = jnp.take(ioff[0], dst)
                chunk = jax.lax.dynamic_slice(
                    send_ext, (start, 0), (round_max[r - 1], dfeat))
                perm = [(j, (j + r) % D) for j in range(D)]
                parts.append(jax.lax.ppermute(chunk, axis, perm))
            recv = (jnp.concatenate(parts) if parts
                    else jnp.zeros((R_len, dfeat), xs.dtype))
        # interior: reads only the local shard — overlaps the exchange
        acc = jax.ops.segment_sum(
            jnp.take(xs, ci[0], axis=0) * vi[0][:, None], ri[0],
            num_segments=rows_per)
        # boundary: consumes the receive buffer once it lands
        acc = acc + jax.ops.segment_sum(
            jnp.take(recv, cb[0], axis=0) * vb[0][:, None], rb[0],
            num_segments=rows_per)
        return acc[None]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * 11 + (P(axis),),
        out_specs=P(axis))
    if padded:
        out = fn(hp.row_int, hp.col_int, hp.val_int, hp.row_bnd,
                 hp.col_bnd, hp.val_bnd, hp.send_flat, hp.in_offsets,
                 hp.send_sizes, hp.out_offsets, hp.recv_sizes, x)
        return out.reshape(-1, x.shape[-1])
    pad = D * rows_per - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[-1]), x.dtype)])
    out = fn(hp.row_int, hp.col_int, hp.val_int, hp.row_bnd, hp.col_bnd,
             hp.val_bnd, hp.send_flat, hp.in_offsets, hp.send_sizes,
             hp.out_offsets, hp.recv_sizes, x)
    return out.reshape(-1, x.shape[-1])[: part.n_rows]


def shard_spmm(mesh: Mesh, part: RowPartition, x: jax.Array,
               mode: str = "replicated", axis: str = "data") -> jax.Array:
    """Distributed A @ x.  Returns [S*rows_per, d] (crop to n_rows)."""
    rows_per = part.rows_per_shard

    if mode == "replicated":
        x_spec = P()
    else:
        x_spec = P(axis)  # node-sharded features

    def local(row_l, col, val, xs):
        row_l, col, val = row_l[0], col[0], val[0]
        if mode == "gather":
            xs = jax.lax.all_gather(xs, axis, axis=0, tiled=True)
        gathered = jnp.take(xs, col, axis=0) * val[:, None]
        out = jax.ops.segment_sum(gathered, row_l,
                                  num_segments=rows_per)
        return out[None]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), x_spec),
        out_specs=P(axis))
    n_shards = part.row_local.shape[0]
    if mode == "gather":
        pad = n_shards * rows_per - x.shape[0]
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[-1]), x.dtype)])
    out = fn(part.row_local, part.col, part.val, x)
    return out.reshape(-1, x.shape[-1])[: part.n_rows]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistAdj:
    """Mesh-sharded full-graph adjacency with the local ``matmul``
    contract, so it drops into ``models.base.aggregate`` and every
    evaluator/hoist path unchanged (VERDICT r2 item 5: compose the dist
    layer into evaluation).

    Rows are partitioned by the multilevel edge-cut order.  Two calling
    conventions:

    * **padded domain** (steady state): features pre-permuted into
      partition order and padded to ``[S*rows_per, d]`` via
      :meth:`pad_features`, then every layer's SpMM goes through
      :meth:`padded_view` — a pure shard_map with no per-call
      permute/pad/crop.  Indices into model outputs are remapped once
      via :meth:`remap_idx`.  Per-call permute/pad/crop are *unsharded*
      mesh ops that each cost a mesh-wide reshard (docs/PERF.md r4).
    * **convenience**: ``matmul`` on an ``[n, d]`` original-order array
      permutes in, runs, and permutes back — correct everywhere, paying
      the reshards; fine for one-shot calls.
    """

    hp: RaggedHaloPartition
    order: jax.Array      # new -> old node id
    inv: jax.Array        # old -> new node id
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_padded(self) -> int:
        p = self.hp.base
        return p.row_local.shape[0] * p.rows_per_shard

    def pad_features(self, x: jax.Array) -> jax.Array:
        """Permute rows into partition order and zero-pad to the padded
        domain ``[S*rows_per, d]`` (do this ONCE per forward, outside
        the per-layer hot path)."""
        xo = jnp.take(x, self.order, axis=0)
        pad = self.n_padded - xo.shape[0]
        if pad:
            xo = jnp.concatenate(
                [xo, jnp.zeros((pad,) + xo.shape[1:], xo.dtype)])
        return xo

    def remap_idx(self, idx) -> jax.Array:
        """Original-order node indices → padded-domain row indices."""
        return jnp.take(self.inv, jnp.asarray(idx))

    def matmul(self, x: jax.Array) -> jax.Array:
        # Always the original-order convenience path.  Shape-based
        # dispatch to the padded domain is a trap when n_rows divides
        # evenly into shards (n_padded == n_rows makes the two layouts
        # indistinguishable and a padded caller would be silently
        # re-permuted) — padded-domain callers must use padded_view().
        if x.shape[0] != self.hp.base.n_rows:
            raise ValueError(
                f"DistAdj.matmul expects original-order [n_rows={self.hp.base.n_rows}, d] "
                f"features, got {x.shape}; for padded-domain "
                f"[{self.n_padded}, d] arrays use padded_view().matmul")
        out = shard_spmm_halo_ragged(
            self.mesh, self.hp, jnp.take(x, self.order, axis=0),
            axis=self.axis)
        return jnp.take(out, self.inv, axis=0)

    def padded_view(self) -> "PaddedDistAdj":
        """View whose ``matmul`` ALWAYS uses the padded domain —
        unambiguous even when ``n_rows`` divides evenly into shards."""
        return PaddedDistAdj(self)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaddedDistAdj:
    """Padded-domain view of :class:`DistAdj` (see its docstring):
    ``matmul`` takes and returns ``[S*rows_per, d]`` arrays in partition
    order with no per-call permute/pad/crop.  Duck-types the ``matmul``
    contract of ``models.base.aggregate``."""

    base: DistAdj

    @property
    def nnz(self) -> int:
        return self.base.nnz

    def matmul(self, x: jax.Array) -> jax.Array:
        return shard_spmm_halo_ragged(self.base.mesh, self.base.hp, x,
                                      axis=self.base.axis, padded=True)


def build_dist_adj(adj_norm: G.SparseAdj, mesh: Mesh,
                   axis: str = "data") -> DistAdj:
    """Partition a normalized full-graph adjacency over ``mesh``.

    Note: the auto exchange choice is the overlapped ppermute rounds
    (see ``shard_spmm_halo_ragged``), so no support probe runs here.
    Callers opting into ``use_ragged=True`` under jit should call
    ``_ragged_a2a_supported(mesh, axis)`` once eagerly themselves —
    inside a trace the probe cannot execute.
    """
    n_shards = int(mesh.devices.size)
    order = edge_cut_order(adj_norm, n_shards)
    a2 = reorder_adj(adj_norm, order)
    hp = partition_rows_halo_ragged(a2, n_shards)
    inv = np.empty(adj_norm.n_rows, dtype=np.int64)
    inv[order] = np.arange(adj_norm.n_rows)
    return DistAdj(hp=hp, order=jnp.asarray(order, jnp.int32),
                   inv=jnp.asarray(inv, jnp.int32), mesh=mesh, axis=axis,
                   nnz=int(adj_norm.nnz))


def sharded_graph_forward(mesh: Mesh, part: RowPartition, w_list,
                          x: jax.Array, axis: str = "data") -> jax.Array:
    """Multi-layer GCN-style forward with a sharded graph: per layer
    X ← A @ (X W), relu between layers.  Used by the multi-chip dry run."""
    h = x
    for i, w in enumerate(w_list):
        h = h @ w
        h = shard_spmm(mesh, part, h, mode="replicated", axis=axis)
        if i != len(w_list) - 1:
            h = jax.nn.relu(h)
    return h
