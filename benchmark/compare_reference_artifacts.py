"""Structural property comparison: reference real-cora artifacts vs ours.

VERDICT r2 item 4: load the reference's checked-in real reduced-cora
outputs (``/root/reference/interface/reduced_graph`` — produced on the
real Planetoid cora by the reference's own methods, artifact layout
``interface/vis_graphslim.py:26-117``), run our PropertyEvaluator on
them, and compare against our own GCond/GCondX/random outputs on the
calibrated cora twin at the same rate.  Emits the markdown table for
docs/PERF.md.

Run on CPU (the graphs are tiny):
    python benchmark/compare_reference_artifacts.py [--epochs 120]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax

if os.environ.get("GRAFT_COMPARE_BACKEND", "cpu") == "cpu":
    # tiny graphs: CPU by default; set GRAFT_COMPARE_BACKEND=tpu to run
    # the condensations on the chip (the cora twin's d=1433 per-class
    # gradient blocks are ~100x faster there)
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))

import numpy as np  # noqa: E402

from graphslim_tpu import compat  # noqa: E402
from graphslim_tpu.config import get_args  # noqa: E402
from graphslim_tpu.data import load  # noqa: E402
from graphslim_tpu.eval.property import PropertyEvaluator  # noqa: E402
from graphslim_tpu.reduce import create_reducer  # noqa: E402

ROOT = "/root/reference/interface/reduced_graph"
KEYS = ["density", "laplacian_trace", "spectral_radius",
        "cluster_coefficient", "homophily", "davies_bouldin"]


def props_of(pe, adj, feat, labels):
    return pe.properties(adj, feat, labels)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120,
                    help="condensation epochs for our methods (paper "
                         "config is 600+; short run is structure-"
                         "representative)")
    ap.add_argument("--rate", type=float, default=0.5)
    ns = ap.parse_args()

    ds = load("cora", setting="trans", split="fixed", seed=0)
    pe = PropertyEvaluator.__new__(PropertyEvaluator)

    rows: list[tuple[str, dict]] = []
    rows.append(("cora twin (full)",
                 props_of(pe, ds.adj, ds.feat, ds.labels)))

    # reference real-cora artifacts (recoverable subset)
    for m in ("gcond", "gcondx", "random"):
        red = compat.load_reference_reduced(ROOT, m, "cora", ns.rate)
        rows.append((f"reference {m} (real cora)",
                     props_of(pe, red.adj, red.feat, red.labels)))

    # our methods on the calibrated twin at the same rate
    import sys
    import time
    t0 = time.time()
    for m in ("gcond", "gcondx", "random"):
        args = get_args(["-D", "cora", "-M", m, "-R", str(ns.rate),
                         "--epochs", str(ns.epochs),
                         "--save_path", "/tmp/graft_props"])
        red = create_reducer(m, ds, args).reduce(ds)
        adj = red.adj
        if adj is not None and hasattr(adj, "ndim") and adj.ndim == 3:
            adj = adj[0]
        rows.append((f"ours {m} (cora twin)",
                     props_of(pe, adj, red.feat, red.labels)))
        print(f"[{time.time()-t0:6.0f}s] ours {m} done", file=sys.stderr,
              flush=True)

    hdr = "| graph | " + " | ".join(KEYS) + " |"
    sep = "|" + "---|" * (len(KEYS) + 1)
    print()
    print(hdr)
    print(sep)
    for name, p in rows:
        cells = " | ".join(f"{p.get(k, float('nan')):.3f}" for k in KEYS)
        print(f"| {name} | {cells} |")


if __name__ == "__main__":
    main()
