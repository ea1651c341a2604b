"""Artifact store: persist/load reduced-graph triples.

Replaces reference ``save_reduced``/``load_reduced``/``get_syn_data``/
``sparsify`` (``graphslim/dataset/utils.py:8-66,136-296``).  One ``.npz``
per triple instead of three ``.pt`` files; the path layout mirrors the
reference so downstream tooling stays familiar:
``{save_path}/reduced_graph/{method}/{dataset}_{r}_{seed}.npz``
(attack variant under ``corrupt_graph/{attack}/...``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from graphslim_tpu import graph as G


def _triple_path(save_path: str, method: str, dataset: str, r: float,
                 seed: int, attack: Optional[str] = None) -> str:
    base = os.path.abspath(os.path.expanduser(save_path))
    if attack:
        root = os.path.join(base, "corrupt_graph", attack, "reduced_graph",
                            method)
    else:
        root = os.path.join(base, "reduced_graph", method)
    return os.path.join(root, f"{dataset}_{r}_{seed}.npz")


def save_reduced(reduced: G.Reduced, save_path: str, method: str,
                 dataset: str, r: float, seed: int,
                 attack: Optional[str] = None) -> str:
    path = _triple_path(save_path, method, dataset, r, seed, attack)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "feat": np.asarray(reduced.feat),
        "labels": np.asarray(reduced.labels),
    }
    if reduced.adj is None:
        payload["adj_kind"] = np.array("identity")
    elif isinstance(reduced.adj, G.SparseAdj):
        payload["adj_kind"] = np.array("sparse")
        payload["adj_row"] = np.asarray(reduced.adj.row)
        payload["adj_col"] = np.asarray(reduced.adj.col)
        payload["adj_val"] = np.asarray(reduced.adj.values_or_ones())
        payload["adj_n"] = np.array(reduced.adj.n_rows)
    else:
        payload["adj_kind"] = np.array("dense")
        payload["adj"] = np.asarray(reduced.adj)
    np.savez_compressed(path, **payload)
    return path


def load_reduced(save_path: str, method: str, dataset: str, r: float,
                 seed: int, attack: Optional[str] = None) -> G.Reduced:
    path = _triple_path(save_path, method, dataset, r, seed, attack)
    data = np.load(path, allow_pickle=False)
    feat = jnp.asarray(data["feat"])
    labels = jnp.asarray(data["labels"])
    kind = str(data["adj_kind"])
    if kind == "identity":
        adj = None
    elif kind == "sparse":
        ei = np.stack([data["adj_row"], data["adj_col"]])
        adj = G.from_edge_index(ei, int(data["adj_n"]),
                                edge_weight=data["adj_val"], dedup=False)
    else:
        adj = jnp.asarray(data["adj"])
    return G.Reduced(feat=feat, adj=adj, labels=labels)


def sparsify(reduced: G.Reduced, model_type: str, method: str,
             threshold: float = 0.0, verbose: bool = False) -> G.Reduced:
    """Model-aware post-sparsification of a condensed dense adjacency.

    Reference policy (``dataset/utils.py:8-66``): MLP → identity adjacency;
    GAT → hard threshold 0.5 (trajectory-style methods 0.1);
    gcond/doscond-family → ``args.threshold``; entries below the threshold
    are zeroed.
    """
    if model_type == "MLP":
        return G.Reduced(feat=reduced.feat, adj=None, labels=reduced.labels)
    adj = reduced.adj
    if adj is None or isinstance(adj, G.SparseAdj):
        return reduced
    if model_type == "GAT":
        t = 0.5 if method in ("gcond", "doscond", "gcdm", "sgdd",
                              "gcsntk", "msgc") else 0.1
    else:
        t = threshold
    if t > 0:
        adj = jnp.where(adj < t, 0.0, adj)
    return G.Reduced(feat=reduced.feat, adj=adj, labels=reduced.labels)


def get_syn_data(save_path: str, method: str, dataset: str, r: float,
                 seed: int, model_type: str = "GCN", threshold: float = 0.0,
                 attack: Optional[str] = None) -> G.Reduced:
    """Load + model-aware sparsify (reference ``dataset/utils.py:261-296``)."""
    reduced = load_reduced(save_path, method, dataset, r, seed, attack)
    return sparsify(reduced, model_type, method, threshold)
