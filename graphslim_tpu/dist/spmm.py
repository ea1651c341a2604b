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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from graphslim_tpu import graph as G


class RowPartition(NamedTuple):
    """Edge lists per shard, padded to a common length.

    ``row_local[s, e]`` is the row index *within shard s*; padded slots
    carry ``val = 0`` so they contribute nothing.
    """

    row_local: jax.Array   # [S, E_max] int32
    col: jax.Array         # [S, E_max] int32 (global)
    val: jax.Array         # [S, E_max] float32
    rows_per_shard: int
    n_rows: int


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
