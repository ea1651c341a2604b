"""Degree-distribution comparison plot (reference ``benchmark/dd_plot.py``)."""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


import os

import numpy as np

from graphslim_tpu import graph as G
from graphslim_tpu.config import get_args
from graphslim_tpu.data import get_syn_data, load


def degree_hist(adj) -> np.ndarray:
    if adj is None:
        return np.array([0.0])
    if isinstance(adj, G.SparseAdj):
        return np.asarray(adj.sum_rows())
    a = np.asarray(adj)
    return a.sum(1)


def main():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    args = get_args()
    data = load(args.dataset, setting=args.setting, split=args.split,
                seed=args.seed, data_dir=args.load_path)
    reduced = get_syn_data(args.save_path, args.method, args.dataset,
                           args.reduction_rate, args.seed,
                           threshold=args.threshold)
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, adj in [("original", data.adj), ("reduced", reduced.adj)]:
        deg = degree_hist(adj)
        ax.hist(deg, bins=40, alpha=0.5, label=name, density=True)
    ax.set_xlabel("weighted degree")
    ax.set_ylabel("density")
    ax.set_yscale("log")
    ax.legend()
    out = os.path.join(args.save_path, "figures",
                       f"dd_{args.method}_{args.dataset}.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main()
