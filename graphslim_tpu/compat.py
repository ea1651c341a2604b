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
