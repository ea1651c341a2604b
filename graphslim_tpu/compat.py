"""Interop boundary: convert to/from torch / PyG / DGL representations.

Re-design of reference ``graphslim/compat.py:20-81``: duck-typed
converters so downstream torch pipelines can consume reduced graphs.
PyG/DGL are optional — plain torch tensors are always produced; the
framework itself never depends on them.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from graphslim_tpu import graph as G


def to_torch(reduced_or_data: Any) -> dict:
    """{'x', 'edge_index', 'edge_weight', 'y'} as torch tensors."""
    import torch

    if isinstance(reduced_or_data, G.Reduced):
        feat = np.asarray(reduced_or_data.feat)
        labels = np.asarray(reduced_or_data.labels)
        adj = reduced_or_data.adj
        if adj is None:
            n = feat.shape[0]
            ei = np.stack([np.arange(n), np.arange(n)])
            ew = np.ones(n, dtype=np.float32)
        elif isinstance(adj, G.SparseAdj):
            ei = G.to_edge_index(adj)
            ew = np.asarray(adj.values_or_ones())
        else:
            a = np.asarray(adj)
            r, c = np.nonzero(a)
            ei, ew = np.stack([r, c]), a[r, c]
    else:  # Dataset
        d = reduced_or_data
        feat = np.asarray(d.feat)
        labels = np.asarray(d.labels)
        ei = G.to_edge_index(d.adj)
        ew = np.asarray(d.adj.values_or_ones())
    return {
        "x": torch.from_numpy(np.array(feat, copy=True)),
        "edge_index": torch.from_numpy(
            np.array(ei, copy=True)).long(),
        "edge_weight": torch.from_numpy(
            np.array(ew, copy=True)).float(),
        "y": torch.from_numpy(np.array(labels, copy=True)),
    }


def to_pyg_data(obj: Any):
    """torch_geometric.data.Data when PyG is importable
    (reference ``compat.py:20-48``)."""
    blob = to_torch(obj)
    try:
        from torch_geometric.data import Data
    except ImportError as e:
        raise ImportError("torch_geometric not installed") from e
    return Data(x=blob["x"], edge_index=blob["edge_index"],
                edge_weight=blob["edge_weight"], y=blob["y"])


def to_dgl_graph(obj: Any):
    """dgl.graph when DGL is importable (reference ``compat.py:50-81``)."""
    blob = to_torch(obj)
    try:
        import dgl
    except ImportError as e:
        raise ImportError("dgl not installed") from e
    g = dgl.graph((blob["edge_index"][0], blob["edge_index"][1]),
                  num_nodes=blob["x"].shape[0])
    g.ndata["feat"] = blob["x"]
    g.ndata["label"] = blob["y"]
    g.edata["weight"] = blob["edge_weight"]
    return g


def from_dgl(g, hetero: bool = False) -> tuple:
    """(feat, SparseAdj, labels) from a DGL graph; heterographs are
    flattened by merging all edge types (reference
    ``dataset/convertor.py:15-58`` FraudDataset path)."""
    import jax.numpy as jnp

    if hetero or (hasattr(g, "etypes") and len(g.etypes) > 1):
        srcs, dsts = [], []
        for et in g.canonical_etypes:
            s, d = g.edges(etype=et)
            srcs.append(np.asarray(s))
            dsts.append(np.asarray(d))
        ei = np.stack([np.concatenate(srcs), np.concatenate(dsts)])
    else:
        s, d = g.edges()
        ei = np.stack([np.asarray(s), np.asarray(d)])
    feat = np.asarray(g.ndata["feature" if "feature" in g.ndata
                              else "feat"])
    labels = np.asarray(g.ndata["label"])
    adj = G.from_edge_index(ei, feat.shape[0], symmetrize=True)
    return (jnp.asarray(feat, dtype=jnp.float32), adj,
            jnp.asarray(labels.astype(np.int32)))


class SalvageError(RuntimeError):
    """Raised when a mangled torch archive cannot be recovered losslessly."""


def _salvage_mangled_pt(path: str) -> np.ndarray:
    """Recover a tensor from a UTF-8-mangled torch zip archive.

    Some checked-in reference artifacts
    (``/root/reference/interface/reduced_graph/*/label_*.pt`` and the
    ``*_0.25_*`` adjacencies) were at some point decoded as UTF-8 with
    ``errors='replace'`` and re-encoded: every valid multi-byte sequence
    survives (re-encoding each char restores the original bytes) while
    invalid bytes became U+FFFD and are lost.  int64 label payloads are
    pure ASCII (values 0..nclass-1 < 0x80) so they survive bit-exact; we
    re-anchor on the ``data/0`` zip local header and extract the payload,
    refusing (raising :class:`SalvageError`) if any lost byte falls
    inside it.  float32 payloads are typically unrecoverable.
    """
    import struct

    s = open(path, "rb").read().decode("utf-8")
    by = bytearray()
    lost: set[int] = set()
    for c in s:
        if c == "�":
            lost.add(len(by))
            by.append(0)
        else:
            by.extend(c.encode("utf-8"))
    data = bytes(by)

    # storage dtype from the (mostly-ASCII) pickle
    if b"LongStorage" in data:
        dtype, isize = "<i8", 8
    elif b"IntStorage" in data:
        dtype, isize = "<i4", 4
    elif b"FloatStorage" in data:
        dtype, isize = "<f4", 4
    elif b"DoubleStorage" in data:
        dtype, isize = "<f8", 8
    else:
        raise SalvageError(f"{path}: no recognizable storage dtype")

    j = data.find(b"data/0")
    if j < 0:
        raise SalvageError(f"{path}: no data/0 entry")
    hdr = data.rfind(b"PK\x03\x04", 0, j)
    if hdr < 0:
        # a 'data/0' substring with no preceding local-file header is
        # not a torch archive — without this guard the header fields
        # would be parsed from data[25:29] garbage (ADVICE r3)
        raise SalvageError(f"{path}: no local header before data/0")
    nlen, elen = struct.unpack("<HH", data[hdr + 26:hdr + 30])
    start = hdr + 30 + nlen + elen
    # end anchor: local header of the 'version' member that follows the
    # payload in torch's archive layout (byte-searching the payload
    # itself for "PK" would misfire on arbitrary binary)
    v = data.find(b"version", start)
    if v < 0:
        raise SalvageError(f"{path}: no trailing version member")
    end = data.rfind(b"PK\x03\x04", start, v)
    if end < 0:
        end = v
    # drop a trailing data descriptor (PK\x07\x08 + 12 bytes) if present
    dd = data.rfind(b"PK\x07\x08", start, end)
    if dd >= 0:
        end = dd
    end = start + ((end - start) // isize) * isize
    if any(start <= u < end for u in lost):
        raise SalvageError(f"{path}: lost bytes inside tensor payload")
    return np.frombuffer(data[start:end], dtype=dtype).copy()


def load_torch_artifact(path: str) -> np.ndarray:
    """Load a ``.pt`` tensor artifact as a numpy array.

    Tries ``torch.load`` first; falls back to the UTF-8-mangle salvage
    path for the corrupted reference archives (see
    :func:`_salvage_mangled_pt`).
    """
    import torch

    try:
        t = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        return _salvage_mangled_pt(path)
    if getattr(t, "is_sparse", False) or getattr(t, "is_sparse_csr", False):
        t = t.to_dense()
    return np.asarray(t.detach().cpu().numpy())


def load_reference_reduced(root: str, method: str, dataset: str,
                           rate: float, seed: int = 1) -> "G.Reduced":
    """Load a reference checked-in reduced graph as a :class:`G.Reduced`.

    Mirrors the reference artifact layout
    (``interface/vis_graphslim.py:26-117``):
    ``{root}/{method}/adj_{dataset}_{rate}_{seed}.pt`` + ``label_...``.
    The reference stores no features for these browser artifacts, so
    ``feat`` is a one-hot label encoding placeholder unless the caller
    swaps in real features.
    """
    import os

    import jax.numpy as jnp

    adj_p = os.path.join(root, method, f"adj_{dataset}_{rate}_{seed}.pt")
    lab_p = os.path.join(root, method, f"label_{dataset}_{rate}_{seed}.pt")
    adj = load_torch_artifact(adj_p).astype(np.float32)
    n = adj.shape[0]
    labels = load_torch_artifact(lab_p).astype(np.int64)
    if labels.shape[0] != n:
        raise SalvageError(
            f"label length {labels.shape[0]} != adj rows {n}")
    nclass = int(labels.max()) + 1
    feat = np.eye(nclass, dtype=np.float32)[labels]
    return G.Reduced(feat=jnp.asarray(feat),
                     adj=jnp.asarray(adj),
                     labels=jnp.asarray(labels.astype(np.int32)))


def save_reference_layout(reduced: "G.Reduced", root: str, method: str,
                          dataset: str, rate: float,
                          seed: int = 1) -> tuple[str, str]:
    """Write a reduced graph in the reference's artifact layout.

    Mirrors ``interface/reduced_graph/{method}/
    {adj,label}_{dataset}_{rate}_{seed}.pt`` (the layout
    ``vis_graphslim.py:26-117`` reads), so reference-side tooling can
    consume graphs produced here.  Structure-free methods store the
    identity like the reference's gcondx artifacts.  Returns the two
    file paths.
    """
    import os

    import torch

    d = os.path.join(root, method)
    os.makedirs(d, exist_ok=True)
    labels = np.asarray(reduced.labels)
    if labels.ndim == 2:
        labels = labels.argmax(1)
    n = labels.shape[0]
    adj = reduced.adj
    if adj is None:
        adj_np = np.eye(n, dtype=np.float32)
    elif isinstance(adj, G.SparseAdj):
        adj_np = np.asarray(adj.to_dense(), dtype=np.float32)
    else:
        adj_np = np.asarray(adj, dtype=np.float32)
        if adj_np.ndim == 3:
            adj_np = adj_np[0]
    adj_p = os.path.join(d, f"adj_{dataset}_{rate}_{seed}.pt")
    lab_p = os.path.join(d, f"label_{dataset}_{rate}_{seed}.pt")
    torch.save(torch.from_numpy(np.ascontiguousarray(adj_np)), adj_p)
    torch.save(torch.from_numpy(
        np.ascontiguousarray(labels.astype(np.int64))), lab_p)
    return adj_p, lab_p


def from_torch(x, edge_index, y, edge_weight=None,
               name: str = "external") -> tuple:
    """(feat jnp, SparseAdj, labels jnp) from torch tensors."""
    import jax.numpy as jnp

    feat = jnp.asarray(np.asarray(x.detach().cpu()))
    labels = jnp.asarray(np.asarray(y.detach().cpu()))
    ei = np.asarray(edge_index.detach().cpu())
    ew = None if edge_weight is None else np.asarray(
        edge_weight.detach().cpu())
    adj = G.from_edge_index(ei, feat.shape[0], edge_weight=ew,
                            dedup=True)
    return feat, adj, labels
