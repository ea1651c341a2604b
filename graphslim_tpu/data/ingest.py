"""On-disk dataset ingestion (no framework deps — plain arrays).

Reads two real formats when a data directory is available:

* **GraphSAINT layout** (what the reference's ``DataGraphSAINT`` downloads,
  ``graphslim/dataset/loader.py:380-515``): ``adj_full.npz`` (scipy CSR),
  ``feats.npy``, ``class_map.json``, ``role.json``.
* **Generic npz**: one ``{name}.npz`` with keys ``edge_index``, ``feat``,
  ``labels`` and optional ``idx_train/idx_val/idx_test``.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def try_load(name: str, data_dir: str):
    """Return ``(edge_index, feat, labels, role_or_None)`` or ``None``."""
    root = os.path.join(data_dir, name)
    saint = os.path.join(root, "adj_full.npz")
    if os.path.exists(saint):
        return _load_graphsaint(root)
    generic = os.path.join(data_dir, f"{name}.npz")
    if os.path.exists(generic):
        return _load_generic(generic)
    return None


def _load_graphsaint(root: str):
    import scipy.sparse as sp

    adj = sp.load_npz(os.path.join(root, "adj_full.npz")).tocoo()
    edge_index = np.stack([adj.row, adj.col]).astype(np.int64)
    feat = np.load(os.path.join(root, "feats.npy")).astype(np.float32)
    with open(os.path.join(root, "class_map.json")) as f:
        class_map = json.load(f)
    labels = np.zeros(feat.shape[0], dtype=np.int32)
    for k, v in class_map.items():
        labels[int(k)] = int(v) if np.isscalar(v) else int(np.argmax(v))
    with open(os.path.join(root, "role.json")) as f:
        role = json.load(f)
    return edge_index, feat, labels, role


def _load_generic(path: str):
    data = np.load(path, allow_pickle=False)
    edge_index = data["edge_index"].astype(np.int64)
    feat = data["feat"].astype(np.float32)
    labels = data["labels"].astype(np.int32)
    role = None
    if "idx_train" in data:
        role = {"tr": data["idx_train"], "va": data["idx_val"],
                "te": data["idx_test"]}
    return edge_index, feat, labels, role
