"""Dataset loading: registry of specs, splits, transforms, inductive views.

Replaces reference ``get_dataset``/``TransAndInd``/``splits``
(``graphslim/dataset/loader.py:39-230``, ``dataset/utils.py:97-133``).
"""

from __future__ import annotations

import dataclasses
import os
import zlib
from typing import Optional

import jax.numpy as jnp
import numpy as np

from graphslim_tpu import graph as G
from graphslim_tpu.data import ingest, synthetic


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """Static profile of a dataset (drives both synthesis and policy)."""

    name: str
    n_nodes: int
    n_feat: int
    nclass: int
    avg_degree: float
    homophily: float
    transform: str       # 'row_norm' | 'standardize' | 'none'
    default_setting: str  # forced trans/ind per reference config.py:223-225
    split: str = "fixed"  # default split style
    metric: str = "accuracy"
    synth_ok: bool = True  # False → real files required (too large to
    #                        synthesize: ogbn-proteins/papers100M)
    # Twin-hardness calibration (round 2): tuned so full-graph GCN lands
    # in the reference's published accuracy regime (GC4NC, arXiv
    # 2406.16715: cora≈0.81, citeseer≈0.72, arxiv≈0.71, flickr≈0.47,
    # reddit≈0.94) instead of the saturated ~0.99 of round 1.  See
    # synthetic.generate for knob semantics.
    feature_noise: float = 1.2
    center_scale: float = 1.3
    label_noise: float = 0.0
    feature_mix: float = 0.3  # structural smoothing baked into features
    target_acc: float = 0.0   # documentation: calibration target (0=n/a)
    # Fraction of within-class edges attached to ring-local neighbors
    # (community structure below class granularity — real graphs have
    # it, pure SBM blocks are expanders; see synthetic.generate).
    locality: float = 0.0
    locality_window: float = 0.005


# Scales follow the reference's dataset table (efficiency.md:123-131 and
# PyG dataset cards); homophily/degree approximate the public statistics.
_SPECS = [
    # Real data: Zachary's karate club via networkx (34 nodes, 2 factions,
    # REAL graph — no download needed).  Features are the identity matrix
    # (the standard GCN-on-karate convention); tiny, but every number on
    # it is a real-graph number.
    DatasetSpec("karate", 34, 34, 2, 4.6, 0.72, "none", "trans",
                "few", synth_ok=False),
    # Test fixtures: deliberately easy (high separation), NOT calibrated.
    DatasetSpec("synth-small", 600, 32, 4, 6.0, 0.8, "row_norm", "trans",
                "random", feature_noise=1.0, center_scale=2.0),
    DatasetSpec("synth-ind-small", 800, 48, 5, 6.0, 0.75, "standardize",
                "ind", "random", feature_noise=1.0, center_scale=2.0),
    # Calibrated-hardness fixture: cora-like knobs at fixture scale, for
    # tests that must see a non-saturated regime (random coreset below
    # full graph; condensation measurably better than random).
    DatasetSpec("synth-hard", 900, 48, 5, 5.0, 0.78, "row_norm", "trans",
                "random", feature_noise=1.2, center_scale=0.35,
                label_noise=0.10, target_acc=0.8),
    # Planetoid twins: 'random' split = 20 train / 30 val per class,
    # matching the PUBLIC Planetoid split's supervision scale (the
    # reference trains cora on 140 labeled nodes, not 80 % of the graph).
    DatasetSpec("cora", 2708, 1433, 7, 3.9, 0.81, "row_norm", "trans",
                "random", target_acc=0.81, center_scale=0.35,
                label_noise=0.10),   # measured GCN 0.806, MLP 0.50
    DatasetSpec("citeseer", 3327, 3703, 6, 2.7, 0.74, "row_norm", "trans",
                "random", target_acc=0.72, center_scale=0.33,
                label_noise=0.13),
    DatasetSpec("pubmed", 19717, 500, 3, 4.5, 0.80, "row_norm", "trans",
                "random", target_acc=0.79, center_scale=0.35,
                label_noise=0.17, locality=0.97),
    DatasetSpec("photo", 7650, 745, 8, 31.1, 0.83, "row_norm", "trans",
                "random", target_acc=0.91, center_scale=0.5,
                label_noise=0.05),
    DatasetSpec("computers", 13752, 767, 10, 35.8, 0.78, "row_norm",
                "trans", "random", target_acc=0.86, center_scale=0.45,
                label_noise=0.08),
    DatasetSpec("cs", 18333, 6805, 15, 8.9, 0.81, "row_norm", "trans",
                "random", target_acc=0.92, center_scale=0.55,
                label_noise=0.04),
    DatasetSpec("physics", 34493, 8415, 5, 14.4, 0.93, "row_norm", "trans",
                "random", target_acc=0.95, center_scale=0.6,
                label_noise=0.03),
    DatasetSpec("dblp", 17716, 1639, 4, 6.0, 0.83, "row_norm", "trans",
                "random", target_acc=0.80, center_scale=0.4,
                label_noise=0.12),
    DatasetSpec("ogbn-arxiv", 169343, 128, 40, 13.7, 0.65, "standardize",
                "trans", target_acc=0.71, label_noise=0.18,
                center_scale=0.45, feature_noise=1.3,
                feature_mix=0.1),
    DatasetSpec("flickr", 89250, 500, 7, 10.0, 0.32, "standardize", "ind",
                target_acc=0.47, label_noise=0.28, center_scale=0.45,
                feature_noise=1.5),   # measured @ln=.35: GCN .41 MLP .43
    DatasetSpec("reddit", 232965, 602, 41, 99.6, 0.76, "standardize",
                "ind", target_acc=0.94, label_noise=0.04,
                center_scale=1.5, feature_noise=1.0),
    DatasetSpec("yelp", 45954, 32, 2, 167.0, 0.77, "standardize", "ind",
                metric="f1_macro", label_noise=0.25, center_scale=0.6),
    DatasetSpec("amazon", 11944, 25, 2, 700.0, 0.65, "standardize", "ind",
                metric="f1_macro", label_noise=0.2, center_scale=0.6),
    DatasetSpec("cora_ml", 2995, 2879, 7, 5.5, 0.79, "row_norm", "trans",
                "random", target_acc=0.85, center_scale=0.4,
                label_noise=0.08),
    # ogbn-products: the twin synthesizes (~126M directed edge slots,
    # a few minutes of host NumPy, disk-cached) — the largest
    # one-chip scale exercised (3x reddit; docs/PERF.md round 4).
    # Locality knobs mirror reddit's so edge-cut partitions are
    # realistic for the dist layer.
    DatasetSpec("ogbn-products", 2_449_029, 100, 47, 51.5, 0.81,
                "standardize", "trans", target_acc=0.76,
                label_noise=0.15, center_scale=0.5, feature_noise=1.2,
                locality=0.5, locality_window=0.02),
    # Web-scale OGB datasets: ingestion-only (reference loader.py:66-68)
    DatasetSpec("ogbn-proteins", 132_534, 8, 2, 597.0, 0.6,
                "standardize", "trans", synth_ok=False),
    DatasetSpec("ogbn-papers100m", 111_059_956, 128, 172, 29.1, 0.7,
                "standardize", "trans", synth_ok=False),
]

DATASET_SPECS = {s.name: s for s in _SPECS}


def normalize_name(name: str) -> str:
    """Name normalization matching reference ``loader.py:41-50``."""
    key = name.lower().replace("-", "").replace("_", "")
    for canonical in DATASET_SPECS:
        if canonical.lower().replace("-", "").replace("_", "") == key:
            return canonical
    raise ValueError(f"Dataset name not recognized: {name!r}")


def _make_splits(labels: np.ndarray, nclass: int, split: str,
                 rng: np.random.Generator
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Class-wise splits (reference ``dataset/utils.py:97-133``):

    * ``random``: 20 train / 30 val / rest test per class
    * ``few``:     5 train /  5 val / rest test per class
    * ``fixed``:  80% / 10% / 10% per class
    """
    train, val, test = [], [], []
    for c in range(nclass):
        idx = np.flatnonzero(labels == c)
        idx = rng.permutation(idx)
        if split == "random":
            a, b = 20, 50
        elif split == "few":
            a, b = 5, 10
        else:  # fixed
            a = int(idx.shape[0] * 0.8)
            b = int(idx.shape[0] * 0.9)
        train.append(idx[:a])
        val.append(idx[a:b])
        test.append(idx[b:])
    return (np.sort(np.concatenate(train)), np.sort(np.concatenate(val)),
            np.sort(np.concatenate(test)))


def _synth_cached(name: str, spec: DatasetSpec):
    """Generate (or load from disk cache) the deterministic synthetic
    twin.  Seeded with zlib.crc32 (NOT the salted builtin hash) so the
    graph is identical across processes; large twins (ogbn-arxiv ~30 s of
    host NumPy) cache under ``~/.cache/graphslim_tpu/synth``.  The cache
    key includes the hardness knobs so recalibrating a spec busts stale
    twins."""
    seed = zlib.crc32(name.encode()) % (2 ** 31)
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                             "graphslim_tpu", "synth")
    knobs = (f"fn{spec.feature_noise:g}_cs{spec.center_scale:g}"
             f"_ln{spec.label_noise:g}_mx{spec.feature_mix:g}"
             + (f"_lc{spec.locality:g}w{spec.locality_window:g}"
                if spec.locality else ""))
    path = os.path.join(cache_dir, f"{name}_{knobs}.npz")
    if spec.n_nodes >= 50_000 and os.path.exists(path):
        blob = np.load(path)
        return blob["edge_index"], blob["feat"], blob["labels"]
    out = synthetic.generate(spec.n_nodes, spec.n_feat, spec.nclass,
                             spec.avg_degree, spec.homophily, seed=seed,
                             feature_noise=spec.feature_noise,
                             center_scale=spec.center_scale,
                             label_noise=spec.label_noise,
                             feature_mix=spec.feature_mix,
                             locality=spec.locality,
                             locality_window=spec.locality_window)
    if spec.n_nodes >= 50_000:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            np.savez(path, edge_index=out[0], feat=out[1], labels=out[2])
        except OSError:
            pass
    return out


def _load_karate() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zachary's karate club — a real graph shipped with networkx."""
    import networkx as nx

    g = nx.karate_club_graph()
    edges = np.asarray(list(g.edges()), dtype=np.int64).T
    n = g.number_of_nodes()
    labels = np.asarray(
        [0 if g.nodes[i]["club"] == "Mr. Hi" else 1 for i in range(n)],
        dtype=np.int32)
    feat = np.eye(n, dtype=np.float32)
    return edges, feat, labels


def load(name: str, setting: Optional[str] = None, split: Optional[str]
         = None, seed: int = 0, data_dir: Optional[str] = None,
         pre_norm: bool = False) -> G.Dataset:
    """Load (or synthesize) a dataset and build all views.

    ``data_dir`` pointing at real GraphSAINT-format files
    (``adj_full.npz``/``feats.npy``/``class_map.json``/``role.json``) or a
    generic ``{name}.npz`` takes precedence; otherwise the deterministic
    synthetic twin is generated.  ``pre_norm`` applies the spec's feature
    transform (row-normalize / standardize) like the reference's
    ``TransAndInd`` (``loader.py:113-121``).
    """
    name = normalize_name(name)
    spec = DATASET_SPECS[name]
    setting = setting or spec.default_setting
    split = split or spec.split

    loaded = ingest.try_load(name, data_dir) if data_dir else None
    role = None
    if loaded is not None:
        edge_index, feat_np, labels_np, role = loaded
        nclass = int(labels_np.max()) + 1
    elif name == "karate":
        edge_index, feat_np, labels_np = _load_karate()
        nclass = spec.nclass
    else:
        if not spec.synth_ok:
            raise FileNotFoundError(
                f"{name} is ingestion-only (too large to synthesize); "
                f"provide --load_path with {name}/adj_full.npz or "
                f"{name}.npz")
        edge_index, feat_np, labels_np = _synth_cached(name, spec)
        nclass = spec.nclass

    n = feat_np.shape[0]
    rng = np.random.default_rng(seed)
    if role is not None:  # GraphSAINT role.json split
        idx_train = np.sort(np.asarray(role["tr"]))
        idx_val = np.sort(np.asarray(role["va"]))
        idx_test = np.sort(np.asarray(role["te"]))
    else:
        idx_train, idx_val, idx_test = _make_splits(
            labels_np, nclass, split, rng)

    adj, adj_host = G.from_edge_index(edge_index, n, symmetrize=True,
                                      return_host=True)
    # feature transforms host-side (one device transfer at the end; eager
    # per-op dispatch is costly on remote-compile backends)
    feat_np = np.asarray(feat_np, dtype=np.float32)
    if pre_norm or spec.transform != "none":
        if spec.transform == "standardize":
            mu = feat_np[idx_train].mean(0)
            sd = feat_np[idx_train].std(0)
            feat_np = (feat_np - mu) / np.maximum(sd, 1e-12)
        elif spec.transform == "row_norm":
            norms = np.linalg.norm(feat_np, axis=1, keepdims=True)
            feat_np = feat_np / np.maximum(norms, 1e-12)
    feat = jnp.asarray(feat_np)

    labels = jnp.asarray(labels_np, dtype=jnp.int32)
    ds = G.Dataset(
        name=name, feat=feat, labels=labels, adj=adj,
        idx_train=idx_train, idx_val=idx_val, idx_test=idx_test,
        nclass=nclass, setting=setting, adj_host=adj_host)

    if setting == "ind":
        # Induced train/val/test subgraphs (reference loader.py:125-135);
        # built from the host mirror and host features (no readbacks).
        ds.feat_train = jnp.asarray(feat_np[idx_train])
        ds.labels_train = jnp.asarray(labels_np[idx_train].astype(
            np.int32))
        ds.adj_train = G.submatrix(adj_host, idx_train)
        ds.feat_val = jnp.asarray(feat_np[idx_val])
        ds.labels_val = jnp.asarray(labels_np[idx_val].astype(np.int32))
        ds.adj_val = G.submatrix(adj_host, idx_val)
        ds.feat_test = jnp.asarray(feat_np[idx_test])
        ds.labels_test = jnp.asarray(labels_np[idx_test].astype(np.int32))
        ds.adj_test = G.submatrix(adj_host, idx_test)
    return ds
