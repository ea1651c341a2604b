"""Graph containers: sparse adjacency and dataset pytrees.

TPU-native replacement for the reference's ``TransAndInd`` object and scipy
CSR plumbing (reference ``graphslim/dataset/loader.py:100-230``,
``graphslim/dataset/convertor.py``).  Key design differences:

* One immutable :class:`SparseAdj` holds *both* CSR (``indptr``/``indices``)
  and row-sorted COO (``row``/``col``/``val``) views so SpMM (COO + sorted
  segment-sum) and neighbor sampling (CSR row slicing) each get their
  natural layout with no conversions inside jit.
* Normalization (``gcn_norm`` — reference ``graphslim/utils.py:31-69``) is a
  pure jitted function over device arrays — no GPU→scipy→GPU round trip
  (the reference bounces through scipy at ``graphslim/utils.py:403-413``).
* The dataset object is a frozen dataclass of device arrays; reducers return
  a :class:`Reduced` triple instead of mutating the dataset in place.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphslim_tpu.kernels.spmm import spmm as _spmm


class SparseAdj(NamedTuple):
    """Row-sorted sparse adjacency in joint COO+CSR form.

    Invariants: ``row`` is non-decreasing; ``indptr[r]:indptr[r+1]`` spans the
    entries of row ``r``; ``col == indices``.  ``val`` may be ``None`` for an
    unweighted graph (implicit 1.0).
    """

    indptr: jax.Array   # [n_rows + 1] int32
    row: jax.Array      # [nnz] int32, sorted
    col: jax.Array      # [nnz] int32
    val: Optional[jax.Array]  # [nnz] float or None

    @property
    def n_rows(self) -> int:
        return self.indptr.shape[0] - 1

    @property
    def nnz(self) -> int:
        return self.row.shape[0]

    @property
    def indices(self) -> jax.Array:
        return self.col

    def values_or_ones(self, dtype=jnp.float32) -> jax.Array:
        if self.val is None:
            return jnp.ones((self.nnz,), dtype=dtype)
        return self.val

    def with_val(self, val: jax.Array) -> "SparseAdj":
        return SparseAdj(self.indptr, self.row, self.col, val)

    # --- linear algebra -------------------------------------------------
    def matmul(self, x: jax.Array) -> jax.Array:
        """A @ x via the SpMM kernel dispatch."""
        return _spmm(self.row, self.col, self.val, x, self.n_rows)

    def rmatmul(self, x: jax.Array, n_cols: int) -> jax.Array:
        """A.T @ x (segment over col)."""
        gathered = jnp.take(x, self.row, axis=0)
        if self.val is not None:
            gathered = gathered * self.val[:, None].astype(gathered.dtype)
        return jax.ops.segment_sum(gathered, self.col, num_segments=n_cols)

    def sum_rows(self) -> jax.Array:
        v = self.values_or_ones()
        return jax.ops.segment_sum(v, self.row, num_segments=self.n_rows,
                                   indices_are_sorted=True)

    def to_dense(self, n_cols: Optional[int] = None) -> jax.Array:
        n_cols = n_cols if n_cols is not None else self.n_rows
        v = self.values_or_ones()
        dense = jnp.zeros((self.n_rows, n_cols), dtype=v.dtype)
        return dense.at[self.row, self.col].add(v)


class HostAdj(NamedTuple):
    """Host (NumPy) mirror of a SparseAdj — kept alongside device arrays
    so load-time pipelines (normalization, ELL build, submatrices) never
    read back from the device (expensive on remote/tunneled backends)."""

    indptr: np.ndarray
    row: np.ndarray
    col: np.ndarray
    val: Optional[np.ndarray]

    @property
    def n_rows(self) -> int:
        return self.indptr.shape[0] - 1

    def values_or_ones(self) -> np.ndarray:
        if self.val is None:
            return np.ones(self.row.shape[0], dtype=np.float32)
        return self.val

    def to_sparse(self) -> "SparseAdj":
        return SparseAdj(
            indptr=jnp.asarray(self.indptr, dtype=jnp.int32),
            row=jnp.asarray(self.row, dtype=jnp.int32),
            col=jnp.asarray(self.col, dtype=jnp.int32),
            val=None if self.val is None else jnp.asarray(
                self.val, dtype=jnp.float32))


def host_gcn_norm(h: HostAdj) -> HostAdj:
    """Self loops + symmetric normalization, entirely on host."""
    n = h.n_rows
    row, col, val = h.row, h.col, h.values_or_ones()
    off = row != col
    row = np.concatenate([row[off], np.arange(n)])
    col = np.concatenate([col[off], np.arange(n)])
    val = np.concatenate([val[off].astype(np.float32),
                          np.ones(n, dtype=np.float32)])
    order = np.lexsort((col, row))
    row, col, val = row[order], col[order], val[order]
    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, row, val)
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    vn = (val * dinv[row] * dinv[col]).astype(np.float32)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, row + 1, 1)
    return HostAdj(np.cumsum(indptr), row, col, vn)


def from_edge_index(edge_index: np.ndarray, n_nodes: int,
                    edge_weight: Optional[np.ndarray] = None,
                    symmetrize: bool = False,
                    dedup: bool = True,
                    return_host: bool = False) -> SparseAdj:
    """Build a row-sorted SparseAdj from a [2, E] edge index (host-side).

    Equivalent of reference ``ei2csr`` (``dataset/convertor.py:64-70``).
    Host NumPy on purpose: runs once at load time, result lives on device.
    """
    ei = np.asarray(edge_index)
    row, col = ei[0].astype(np.int64), ei[1].astype(np.int64)
    w = None if edge_weight is None else np.asarray(edge_weight)
    if symmetrize:
        row, col = np.concatenate([row, col]), np.concatenate([col, row])
        if w is not None:
            w = np.concatenate([w, w])
    if dedup:
        keys = row * n_nodes + col
        uniq, inv = np.unique(keys, return_inverse=True)
        if w is not None:
            wsum = np.zeros(uniq.shape[0], dtype=np.float64)
            np.add.at(wsum, inv, w)
            w = wsum
        row, col = uniq // n_nodes, uniq % n_nodes
    else:
        order = np.lexsort((col, row))
        row, col = row[order], col[order]
        if w is not None:
            w = w[order]
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(indptr, row + 1, 1)
    indptr = np.cumsum(indptr)
    host = HostAdj(indptr, row.astype(np.int64), col.astype(np.int64),
                   None if w is None else w.astype(np.float32))
    if return_host:
        return host.to_sparse(), host
    return host.to_sparse()


def from_scipy(mat) -> SparseAdj:
    """Ingest a scipy.sparse matrix (host-side)."""
    coo = mat.tocoo()
    ei = np.stack([coo.row, coo.col])
    return from_edge_index(ei, mat.shape[0], edge_weight=coo.data,
                           dedup=True)


def to_edge_index(adj: SparseAdj) -> np.ndarray:
    """[2, E] host edge index (``csr2ei`` equivalent)."""
    return np.stack([np.asarray(adj.row), np.asarray(adj.col)])


def submatrix(adj: SparseAdj, idx: np.ndarray) -> SparseAdj:
    """adj[np.ix_(idx, idx)] — induced subgraph (host-side, load-time only).

    Equivalent of the reference's per-split submatrices
    (``dataset/loader.py:125-135``).
    """
    idx = np.asarray(idx)
    n = int(np.asarray(adj.indptr).shape[0] - 1)
    lookup = -np.ones(n, dtype=np.int64)
    lookup[idx] = np.arange(idx.shape[0])
    row = lookup[np.asarray(adj.row)]
    col = lookup[np.asarray(adj.col)]
    keep = (row >= 0) & (col >= 0)
    ei = np.stack([row[keep], col[keep]])
    w = None if adj.val is None else np.asarray(adj.val)[keep]
    return from_edge_index(ei, idx.shape[0], edge_weight=w, dedup=False)


# ---------------------------------------------------------------------------
# Normalization (pure, jittable)
# ---------------------------------------------------------------------------

def add_self_loops(adj: SparseAdj, fill_value: float = 1.0) -> SparseAdj:
    """Return adjacency with self loops for any row missing one.

    Host-side (changes nnz). Existing diagonal entries are *replaced* by
    ``fill_value`` to match PyG's ``add_remaining_self_loops`` +
    ``fill_diag`` semantics used by the reference's ``gcn_norm``
    (``graphslim/utils.py:40-43``).
    """
    n = adj.n_rows
    row = np.asarray(adj.row)
    col = np.asarray(adj.col)
    val = np.asarray(adj.values_or_ones())
    off_diag = row != col
    row, col, val = row[off_diag], col[off_diag], val[off_diag]
    loop = np.arange(n)
    row = np.concatenate([row, loop])
    col = np.concatenate([col, loop])
    val = np.concatenate([val, np.full(n, fill_value, dtype=val.dtype)])
    return from_edge_index(np.stack([row, col]), n, edge_weight=val,
                           dedup=True)


def gcn_norm_values(adj: SparseAdj) -> jax.Array:
    """D^-1/2 (A) D^-1/2 edge values (self loops must already be present).

    Jittable; shape-preserving. Reference: ``graphslim/utils.py:31-69``.
    """
    v = adj.values_or_ones()
    deg = jax.ops.segment_sum(v, adj.row, num_segments=adj.n_rows,
                              indices_are_sorted=True)
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return v * jnp.take(dinv, adj.row) * jnp.take(dinv, adj.col)


def gcn_norm(adj: SparseAdj, add_loops: bool = True) -> SparseAdj:
    """Symmetric GCN normalization of a sparse adjacency.

    Host-side NumPy on purpose: this runs once per graph at load time,
    and eager per-op device dispatch is expensive on remote-compile
    backends.  Use :func:`gcn_norm_values` for the jittable in-graph
    variant.
    """
    if add_loops:
        adj = add_self_loops(adj)
    row = np.asarray(adj.row)
    col = np.asarray(adj.col)
    v = (np.ones(row.shape[0], dtype=np.float32) if adj.val is None
         else np.asarray(adj.val))
    deg = np.zeros(adj.n_rows, dtype=np.float64)
    np.add.at(deg, row, v)
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    vn = (v * dinv[row] * dinv[col]).astype(np.float32)
    return adj.with_val(jnp.asarray(vn))


def normalize_adj_dense(adj: jax.Array, add_loops: bool = True) -> jax.Array:
    """Dense D^-1/2 (A+I) D^-1/2 — used on synthetic condensed graphs.

    Reference ``normalize_adj_tensor`` (``graphslim/utils.py:390-413``).
    Jittable; supports batched [B, n, n] input (MSGC path).
    """
    if add_loops:
        eye = jnp.eye(adj.shape[-1], dtype=adj.dtype)
        adj = adj + eye
    deg = adj.sum(axis=-1)
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return adj * dinv[..., :, None] * dinv[..., None, :]


def row_normalize(feat: jax.Array) -> jax.Array:
    """L2 row normalization (reference planetoid feature transform,
    ``dataset/loader.py:120-121``)."""
    norm = jnp.linalg.norm(feat, axis=-1, keepdims=True)
    return feat / jnp.maximum(norm, 1e-12)


def standardize(feat: jax.Array, train_idx: Optional[jax.Array] = None
                ) -> jax.Array:
    """Z-score standardization fit on train rows (reference StandardScaler
    usage for flickr/reddit/arxiv, ``dataset/loader.py:113-119``)."""
    ref = feat if train_idx is None else jnp.take(feat, train_idx, axis=0)
    mu = ref.mean(axis=0)
    sd = ref.std(axis=0)
    return (feat - mu) / jnp.maximum(sd, 1e-12)


# ---------------------------------------------------------------------------
# Dataset containers
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Reduced:
    """The condensed/selected graph triple every reducer returns.

    ``adj`` may be dense [n_syn, n_syn] (condensation), a SparseAdj
    (coreset-induced subgraphs), or None (structure-free methods → identity).
    Mirrors the reference's ``feat_syn/adj_syn/labels_syn`` contract
    (``dataset/loader.py:100-230``).
    """

    feat: jax.Array
    adj: object  # jax.Array | SparseAdj | None
    labels: jax.Array

    @property
    def n_syn(self) -> int:
        return self.feat.shape[0]

    def dense_adj(self) -> jax.Array:
        if self.adj is None:
            return jnp.eye(self.n_syn, dtype=self.feat.dtype)
        if isinstance(self.adj, SparseAdj):
            return self.adj.to_dense()
        return self.adj


@dataclasses.dataclass
class Dataset:
    """Full-graph dataset: the analog of the reference's ``TransAndInd``.

    Immutable by convention (reducers never mutate it); holds both the full
    graph and, for inductive settings, the induced train subgraph the way the
    reference pre-computes ``feat_train/adj_train`` via ``np.ix_``
    (``dataset/loader.py:125-135``).
    """

    name: str
    feat: jax.Array          # [n, d] float32
    labels: jax.Array        # [n] int32
    adj: SparseAdj           # raw (unnormalized, no self loops)
    idx_train: np.ndarray
    idx_val: np.ndarray
    idx_test: np.ndarray
    nclass: int
    setting: str = "trans"   # 'trans' | 'ind'
    # Inductive views (populated by data.load for setting='ind')
    feat_train: Optional[jax.Array] = None
    labels_train: Optional[jax.Array] = None
    adj_train: Optional[SparseAdj] = None
    feat_val: Optional[jax.Array] = None
    labels_val: Optional[jax.Array] = None
    adj_val: Optional[SparseAdj] = None
    feat_test: Optional[jax.Array] = None
    labels_test: Optional[jax.Array] = None
    adj_test: Optional[SparseAdj] = None
    # Host mirror of the raw adjacency (set by the loader; avoids
    # device→host readbacks in load-time pipelines)
    adj_host: Optional["HostAdj"] = dataclasses.field(
        default=None, repr=False)
    # Cached normalized full adjacency (computed lazily)
    _adj_norm: Optional[SparseAdj] = dataclasses.field(
        default=None, repr=False)
    _adj_norm_host: Optional["HostAdj"] = dataclasses.field(
        default=None, repr=False)

    @property
    def n_nodes(self) -> int:
        return self.feat.shape[0]

    @property
    def n_feat(self) -> int:
        return self.feat.shape[1]

    def adj_norm_host(self) -> "HostAdj":
        """Cached host-side normalized adjacency (NumPy)."""
        if self._adj_norm_host is None:
            if self.adj_host is not None:
                host = self.adj_host
            else:  # readback fallback (small graphs only)
                host = HostAdj(np.asarray(self.adj.indptr),
                               np.asarray(self.adj.row),
                               np.asarray(self.adj.col),
                               None if self.adj.val is None
                               else np.asarray(self.adj.val))
            self._adj_norm_host = host_gcn_norm(host)
        return self._adj_norm_host

    def adj_norm(self) -> SparseAdj:
        """Cached GCN-normalized full adjacency (with self loops)."""
        if self._adj_norm is None:
            object.__setattr__(self, "_adj_norm",
                               self.adj_norm_host().to_sparse())
        return self._adj_norm

    def adj_norm_ell(self):
        """Normalized adjacency in the degree-bucketed ELL fast layout
        (scatter-free SpMM — kernels/ell.py); cached, built from the host
        mirror (no device readbacks).

        The per-part working-set cap is BYTES-based: ``max_slots`` is
        sized so one part's gather buffer stays ~4.8 GB (the proven
        reddit-twin budget at d=602 ≈ 2M slots).  A fixed slot count
        over-chunks narrow-feature graphs — the products twin (d=100)
        ran 150+ dispatch-bound chunks at 31 GB/s before this adapted
        (docs/PERF.md round 4).  The sizing width is
        ``max(d, 256)`` because the SAME layout aggregates
        hidden-width activations inside GNN layers (evaluator default
        hidden=256) — sizing by the input width alone would blow the
        budget by ``nhid/d`` on narrow-feature graphs."""
        if not hasattr(self, "_adj_norm_ell") or self._adj_norm_ell is None:
            from graphslim_tpu.kernels.ell import build_ell
            h = self.adj_norm_host()
            d = max(int(self.feat.shape[-1]), 256)
            budget_bytes = 4.8e9
            max_slots = max(int(budget_bytes / (d * 4)), 2_000_000)
            self._adj_norm_ell = build_ell(h.indptr, h.col, h.val,
                                           max_slots=max_slots)
        return self._adj_norm_ell

    def train_graph(self) -> tuple[jax.Array, SparseAdj, jax.Array]:
        """(feat, adj, labels) that reducers should consume.

        Transductive methods read the full graph; inductive read the train
        subgraph (reference ``condensation/gcond.py:22-26``).
        """
        if self.setting == "ind":
            return self.feat_train, self.adj_train, self.labels_train
        return self.feat, self.adj, self.labels

    def labels_for_reduction(self) -> np.ndarray:
        """Host labels of the pool reducers draw from (train split for
        trans — matching ``generate_labels_syn`` over ``labels_train``)."""
        if self.setting == "ind":
            return np.asarray(self.labels_train)
        return np.asarray(self.labels)[self.idx_train]
