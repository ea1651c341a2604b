"""Cache-blocked Pallas SpMM — measured on chip and REJECTED (round 3).

DECISION (2026-08-21, v5e, jax 0.9 / axon AOT toolchain): the kernel
cannot be compiled for TPU because Mosaic's only gather primitive
(`tpu.dynamic_gather`, the same-shape ``take_along_axis`` form) crashes
the AOT compiler for every operand larger than one 8-sublane vreg group
(measured boundary: (8, ≤lanes) ✓, anything with sublane dim ≠ 8 ✗).
An 8-row shuffle cannot express the in-VMEM row gather this design
needs.  Measured same-session: the production ELL SpMM runs at 92 % of
the pure-XLA-gather floor (17.40 ms vs 16.06 ms for the bare gather of
the same 4.6 M rows), so no gather-based kernel has meaningful headroom
anyway.  Full decision trail: docs/PERF.md "Blocked Pallas SpMM —
measured on chip and REJECTED".  The module is kept as the documented
negative result; interpret-mode parity tests keep the layout builder
honest should a future toolchain ship a real VMEM gather.

Original design notes (round-2 re-attempt, VERDICT r1 item 4):

Round 1 established that the XLA row gather runs at a fixed effective
rate regardless of index locality or element width, and rejected per-row
DMA and block-dense MXU designs (docs/PERF.md).  The remaining idea —
this kernel — restructures the *memory system* instead of the gather:

* edges are pre-sorted into ``(dst_tile, src_tile)`` blocks and packed
  into fixed-size chunks (``CHUNK`` edges, padded with val=0);
* the grid walks chunks dst-major; Pallas pipelining streams each
  referenced ``x`` source tile HBM→VMEM **contiguously at full HBM
  bandwidth** (the index maps reuse a tile while consecutive chunks
  share it), replacing the random HBM gather with an in-VMEM gather;
* per chunk the kernel gathers ``x_tile[src_local]`` (VMEM-resident) and
  scatter-adds into the output tile with a one-hot ``[TD, CHUNK] @
  [CHUNK, d]`` matmul on the MXU (accumulation across chunks of the same
  dst tile happens in the VMEM output block, zeroed on first visit).

Whether this wins is decided by measurement on the chip
(``benchmark/probe_spmm.py``): the key rate is the Mosaic VMEM gather.
HBM traffic is ``(n/TD)·|x|`` streamed + edge chunks, independent of
degree skew; padding waste is the blocked-COO chunk fill factor,
reported by :func:`build_blocked`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockedCOO:
    """Chunked (dst_tile, src_tile)-blocked COO layout.

    ``bounds[c, r]`` is the first edge slot of chunk ``c`` whose
    ``dst_local >= r`` (edges are dst-sorted within a chunk by
    construction), enabling the cumsum/boundary-difference scatter that
    stays cheap at large ``td`` (the one-hot matmul scatter costs
    ``td·d`` FLOPs per edge and dies above td≈512).

    Registered as a pytree with the layout constants as *static*
    metadata so the whole container can be a ``jit`` argument (a
    NamedTuple would trace ``td/ts/chunk`` and break the BlockSpec
    construction — caught on-chip, round 3).
    """

    # Edge-slot arrays are stored as [C, CHUNK/128, 128] tiles (and
    # bounds as [C, B/128, 128] with B = td+1 rounded up): Mosaic
    # requires the last two block dims to respect the (8, 128) int32/f32
    # tile, which a [1, CHUNK] 2-D block violates (sublane dim 1).
    dst_local: jax.Array   # [C, CHUNK/128, 128] int32, row within dst tile
    src_local: jax.Array   # [C, CHUNK/128, 128] int32, row within src tile
    val: jax.Array         # [C, CHUNK/128, 128] float32 (0 = padding)
    bounds: jax.Array      # [C, B/128, 128] int32 (see above)
    dst_tile: jax.Array    # [C] int32, per-chunk dst tile id
    src_tile: jax.Array    # [C] int32, per-chunk src tile id
    first_of_dst: jax.Array  # [C] int32 (1 = first chunk of its dst tile)
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    td: int = dataclasses.field(metadata=dict(static=True))
    ts: int = dataclasses.field(metadata=dict(static=True))
    chunk: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(metadata=dict(static=True))


def build_blocked(indptr: np.ndarray, col: np.ndarray,
                  val: np.ndarray | None, td: int = 1024,
                  ts: int = 4096, chunk: int = 2048) -> BlockedCOO:
    """Host-side layout build from CSR (rows sorted ⇒ dst-major order)."""
    indptr = np.asarray(indptr)
    col = np.asarray(col)
    n = indptr.shape[0] - 1
    nnz = col.shape[0]
    values = (np.ones(nnz, dtype=np.float32) if val is None
              else np.asarray(val, dtype=np.float32))
    row = np.repeat(np.arange(n, dtype=np.int64),
                    np.diff(indptr).astype(np.int64))
    dt = row // td
    st = col // ts
    # sort by (dst_tile, src_tile); CSR order already sorts by row ⇒
    # stable sort keeps dst-major order inside ties
    order = np.lexsort((st, dt))
    row, c2, v2, dt, st = (row[order], col[order], values[order],
                           dt[order], st[order])
    # split runs of equal (dt, st) into CHUNK-sized pieces
    key = dt * ((n + ts - 1) // ts + 1) + st
    boundaries = np.flatnonzero(np.diff(key)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [nnz]])
    c_dst, c_src, c_val, c_dt, c_st, c_bnd = [], [], [], [], [], []
    for s, e in zip(starts, ends):
        for off in range(s, e, chunk):
            hi = min(off + chunk, e)
            m = hi - off
            dl = np.zeros(chunk, np.int32)
            sl = np.zeros(chunk, np.int32)
            vv = np.zeros(chunk, np.float32)
            dl[:m] = (row[off:hi] - dt[off] * td).astype(np.int32)
            sl[:m] = (c2[off:hi] - st[off] * ts).astype(np.int32)
            vv[:m] = v2[off:hi]
            # first slot with dst_local >= r (valid edges only); padding
            # slots land at >= m so every row's range excludes them
            bnd = np.searchsorted(dl[:m], np.arange(td + 1),
                                  side="left").astype(np.int32)
            c_dst.append(dl)
            c_src.append(sl)
            c_val.append(vv)
            c_bnd.append(bnd)
            c_dt.append(dt[off])
            c_st.append(st[off])
    C = len(c_dst)
    dt_arr = np.asarray(c_dt, np.int32)
    first = np.ones(C, np.int32)
    first[1:] = (dt_arr[1:] != dt_arr[:-1]).astype(np.int32)
    bnd_pad = -(-(td + 1) // 128) * 128
    bnd_arr = np.zeros((C, bnd_pad), np.int32)
    bnd_arr[:, : td + 1] = np.stack(c_bnd)
    return BlockedCOO(
        dst_local=jnp.asarray(np.stack(c_dst).reshape(C, -1, 128)),
        src_local=jnp.asarray(np.stack(c_src).reshape(C, -1, 128)),
        val=jnp.asarray(np.stack(c_val).reshape(C, -1, 128)),
        bounds=jnp.asarray(bnd_arr.reshape(C, -1, 128)),
        dst_tile=jnp.asarray(dt_arr),
        src_tile=jnp.asarray(np.asarray(c_st, np.int32)),
        first_of_dst=jnp.asarray(first),
        n_rows=n, td=td, ts=ts, chunk=chunk,
        fill=float(nnz) / float(C * chunk))


def spmm_blocked(bc: BlockedCOO, x: jax.Array, interpret: bool = False,
                 scatter: str = "cumsum") -> jax.Array:
    """A @ x via the chunked layout.  ``x`` padded to tile multiples.

    ``scatter='onehot'`` scatter-adds with a ``[td, chunk]`` one-hot MXU
    matmul (simple; cost ``td·d`` FLOPs/edge — only viable for small
    ``td``).  ``scatter='cumsum'`` does an inclusive cumsum over the
    dst-sorted chunk then a boundary-difference per output row (two
    ``[td]`` VMEM gathers) — O(d) per edge, the large-``td``
    configuration the bandwidth analysis requires.
    """
    td, ts, chunk = bc.td, bc.ts, bc.chunk
    d = x.shape[-1]
    if not interpret and scatter == "cumsum" and not (td == ts == chunk):
        raise ValueError(
            "compiled cumsum path requires td == ts == chunk (Mosaic "
            f"same-shape dynamic_gather), got {td}/{ts}/{chunk}")
    n_dst_tiles = -(-bc.n_rows // td)
    n_src_tiles = -(-x.shape[0] // ts)
    xp = x
    if x.shape[0] % ts:
        xp = jnp.concatenate(
            [x, jnp.zeros((n_src_tiles * ts - x.shape[0], d), x.dtype)])
    C = bc.dst_local.shape[0]

    sub = chunk // 128
    bsub = bc.bounds.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,      # dst_tile, src_tile, first_of_dst
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, sub, 128), lambda c, dt, st, fi: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda c, dt, st, fi: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda c, dt, st, fi: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsub, 128), lambda c, dt, st, fi: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, d), lambda c, dt, st, fi: (st[c], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((td, d), lambda c, dt, st, fi: (dt[c], 0),
                               memory_space=pltpu.VMEM),
    )

    def kern(dt_ref, st_ref, fi_ref, dst_ref, src_ref, val_ref,
             bnd_ref, x_ref, out_ref):
        c = pl.program_id(0)
        first = fi_ref[c]
        dst = dst_ref[0].reshape(chunk)
        src = src_ref[0].reshape(chunk)
        val = val_ref[0].reshape(chunk)

        @pl.when(first == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # Mosaic lowers only same-shape take_along_axis row gathers
        # (tpu.dynamic_gather, lowering.py:2484-2524) — hence the
        # td == ts == chunk layout constraint for the compiled path.
        gathered = jnp.take_along_axis(
            x_ref[:], jnp.broadcast_to(src[:, None], (chunk, d)), axis=0)
        weighted = gathered * val[:, None]
        if scatter == "onehot":
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (td, chunk), 0)
                      == dst[None, :])
            out_ref[:] += jax.lax.dot_general(
                onehot.astype(weighted.dtype), weighted,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            bnd = bnd_ref[0].reshape(-1)[: td + 1]      # [td + 1]
            # Hillis-Steele prefix sum via roll+mask — Mosaic has no
            # cumsum lowering (log2(chunk) shifted adds on the VPU)
            cs = weighted.astype(jnp.float32)
            ridx = jax.lax.broadcasted_iota(jnp.int32, (chunk, d), 0)
            shift = 1
            while shift < chunk:
                rolled = pltpu.roll(cs, shift, axis=0)
                cs = cs + jnp.where(ridx >= shift, rolled, 0.0)
                shift *= 2
            # row r sum = cs[bnd[r+1]-1] - cs[bnd[r]-1]  (cs[-1] := 0)
            hi_idx = bnd[1:] - 1
            lo_idx = bnd[:-1] - 1
            hi_b = jnp.broadcast_to(jnp.maximum(hi_idx, 0)[:, None],
                                    (td, d))
            lo_b = jnp.broadcast_to(jnp.maximum(lo_idx, 0)[:, None],
                                    (td, d))
            hi = jnp.where((hi_idx >= 0)[:, None],
                           jnp.take_along_axis(cs, hi_b, axis=0), 0.0)
            lo = jnp.where((lo_idx >= 0)[:, None],
                           jnp.take_along_axis(cs, lo_b, axis=0), 0.0)
            out_ref[:] += hi - lo

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_dst_tiles * td, d), jnp.float32),
        interpret=interpret,
    )(bc.dst_tile, bc.src_tile, bc.first_of_dst,
      bc.dst_local, bc.src_local, bc.val, bc.bounds, xp)
    return out[: bc.n_rows]
