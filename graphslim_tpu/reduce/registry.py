"""Reduction-method registry: name → family → lazily-imported class.

Re-design of reference ``graphslim/reduction/registry.py:41-142`` (36
``MethodSpec`` entries, lazy module import, alias resolution, ``agg``
variant dispatch for coreset methods).
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Optional


@dataclasses.dataclass(frozen=True)
class MethodSpec:
    name: str
    family: str                  # sparsification | coarsening | condensation
    module: str                  # module under graphslim_tpu.reduce
    cls: str
    agg_cls: Optional[str] = None  # aggregated-features variant


_SPECS = [
    # --- coreset sparsification (reference §2.4) -----------------------
    MethodSpec("random", "sparsification", "coreset", "Random",
               agg_cls="RandomAgg"),
    MethodSpec("kcenter", "sparsification", "coreset", "KCenter",
               agg_cls="KCenterAgg"),
    # kcenter_sample's select() is identical to kcenter upstream
    # (reference kcenter_sample.py:10-28; its sampling path is commented
    # out)
    MethodSpec("kcenter_sample", "sparsification", "coreset", "KCenter"),
    MethodSpec("herding", "sparsification", "coreset", "Herding",
               agg_cls="HerdingAgg"),
    MethodSpec("cent_d", "sparsification", "coreset", "CentD"),
    MethodSpec("cent_p", "sparsification", "coreset", "CentP"),
    # --- edge sparsification -------------------------------------------
    MethodSpec("random_edge", "sparsification", "edge_sparsify",
               "RandomEdge"),
    MethodSpec("g_spar", "sparsification", "edge_sparsify", "GSpar"),
    MethodSpec("local_degree", "sparsification", "edge_sparsify",
               "LocalDegree"),
    MethodSpec("scan", "sparsification", "edge_sparsify", "Scan"),
    MethodSpec("spanning_forest", "sparsification", "edge_sparsify",
               "SpanningForest"),
    MethodSpec("rank_degree", "sparsification", "edge_sparsify",
               "RankDegree"),
    MethodSpec("t_spanner", "sparsification", "edge_sparsify", "TSpanner"),
    # --- coarsening (reference §2.5) -----------------------------------
    MethodSpec("variation_neighborhoods", "coarsening", "coarsening",
               "VariationNeighborhoods"),
    MethodSpec("variation_edges", "coarsening", "coarsening",
               "VariationEdges"),
    MethodSpec("variation_cliques", "coarsening", "coarsening",
               "VariationCliques"),
    MethodSpec("heavy_edge", "coarsening", "coarsening", "HeavyEdge"),
    MethodSpec("algebraic_jc", "coarsening", "coarsening", "AlgebraicJC"),
    MethodSpec("affinity_gs", "coarsening", "coarsening", "AffinityGS"),
    MethodSpec("kron", "coarsening", "coarsening", "Kron"),
    MethodSpec("clustering", "coarsening", "clustering", "Cluster",
               agg_cls="ClusterAgg"),
    MethodSpec("averaging", "coarsening", "clustering", "Average"),
    MethodSpec("vng", "coarsening", "vng", "VNG"),
    # --- condensation (reference §2.6) ---------------------------------
    MethodSpec("gcond", "condensation", "gcond", "GCond"),
    MethodSpec("doscond", "condensation", "gcond", "DosCond"),
    MethodSpec("gcondx", "condensation", "gcond", "GCondX"),
    MethodSpec("doscondx", "condensation", "gcond", "DosCondX"),
    MethodSpec("gcdm", "condensation", "gcdm", "GCDM"),
    MethodSpec("gcdmx", "condensation", "gcdm", "GCDMX"),
    MethodSpec("sgdd", "condensation", "sgdd", "SGDD"),
    MethodSpec("msgc", "condensation", "msgc", "MSGC"),
    MethodSpec("sfgc", "condensation", "sfgc", "SFGC"),
    MethodSpec("geom", "condensation", "geom", "GEOM"),
    MethodSpec("gcsntk", "condensation", "gcsntk", "GCSNTK"),
    MethodSpec("simgc", "condensation", "simgc", "SimGC"),
    MethodSpec("gdem", "condensation", "gdem", "GDEM"),
    MethodSpec("gecc", "condensation", "gecc", "GECC"),
    # Unregistered upstream (``condensation/__init__.py:13`` commented
    # out, imports an unbundled compiled dep); complete + registered here.
    MethodSpec("mirage", "condensation", "mirage", "Mirage"),
]

_ALIASES = {
    "algebraic_JC": "algebraic_jc",
    "affinity_GS": "affinity_gs",
    "tspanner": "t_spanner",
    "cluster": "clustering",
    "average": "averaging",
}

REGISTRY = {s.name: s for s in _SPECS}


def get_method_spec(method: str) -> MethodSpec:
    method = _ALIASES.get(method, method)
    if method not in REGISTRY:
        raise ValueError(
            f"Unknown reduction method {method!r}; "
            f"available: {sorted(REGISTRY)}")
    return REGISTRY[method]


def list_methods(family: Optional[str] = None) -> list[str]:
    return sorted(s.name for s in _SPECS
                  if family is None or s.family == family)


def create_reducer(method: str, data, args, **kwargs):
    """Instantiate a reducer (lazy import; ``args.agg`` selects the
    aggregated-features variant like the reference's ``--agg`` flag).

    ``kwargs`` (e.g. ``labels_syn_override``) pass through to the reducer —
    the way condensation imposes its label budget on its init reducer
    (reference ``gcond_base.py:117-152``)."""
    spec = get_method_spec(method)
    mod = importlib.import_module(f"graphslim_tpu.reduce.{spec.module}")
    cls_name = spec.cls
    if getattr(args, "agg", False) and spec.agg_cls is not None:
        cls_name = spec.agg_cls
    cls = getattr(mod, cls_name)
    try:
        return cls(data, args, **kwargs)
    except TypeError:
        if kwargs:
            # reducer without override support (edge sparsifiers etc.)
            return cls(data, args)
        raise
