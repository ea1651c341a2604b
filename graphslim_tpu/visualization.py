"""Graph visualization: original-vs-reduced side-by-side plots.

Re-design of reference ``graphslim/visualization.py:26-96``: networkx
spring layout with a node cap, class-colored nodes, PNG output; exposed
as the ``graphslim-tpu-visualize`` console script.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

from graphslim_tpu import graph as G

log = logging.getLogger("graphslim_tpu")

MAX_NODES = 300


def _to_networkx(adj, labels, max_nodes: int = MAX_NODES):
    import networkx as nx

    if adj is None:
        n = len(labels)
        g = nx.empty_graph(min(n, max_nodes))
        return g, np.asarray(labels)[: min(n, max_nodes)]
    if isinstance(adj, G.SparseAdj):
        row, col = np.asarray(adj.row), np.asarray(adj.col)
        n = adj.n_rows
    else:
        a = np.asarray(adj)
        row, col = np.nonzero(a > (a.mean() if a.size else 0))
        n = a.shape[0]
    keep = min(n, max_nodes)
    g = nx.Graph()
    g.add_nodes_from(range(keep))
    mask = (row < keep) & (col < keep)
    g.add_edges_from(zip(row[mask].tolist(), col[mask].tolist()))
    labels = np.asarray(labels)
    if labels.ndim == 2:
        labels = labels.argmax(1)
    return g, labels[:keep]


def draw_graph_pair(original: G.Dataset, reduced: G.Reduced,
                    out_path: str, title: Optional[str] = None) -> str:
    """Side-by-side spring-layout render → PNG path."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import networkx as nx

    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    for ax, (adj, labels, name) in zip(axes, [
            (original.adj, original.labels, "original"),
            (reduced.adj, reduced.labels, "reduced")]):
        g, lab = _to_networkx(adj, labels)
        pos = nx.spring_layout(g, seed=0)
        nx.draw_networkx_nodes(g, pos, node_color=lab, node_size=25,
                               cmap="tab10", ax=ax)
        nx.draw_networkx_edges(g, pos, alpha=0.2, ax=ax)
        ax.set_title(f"{name} ({g.number_of_nodes()} nodes, "
                     f"{g.number_of_edges()} edges)")
        ax.axis("off")
    if title:
        fig.suptitle(title)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    log.info("wrote %s", out_path)
    return out_path


def main():
    """``graphslim-tpu-visualize`` entry: load a saved reduced triple and
    render it next to the original."""
    from graphslim_tpu.config import get_args
    from graphslim_tpu.data import load, load_reduced

    args = get_args()
    data = load(args.dataset, setting=args.setting, split=args.split,
                seed=args.seed, data_dir=args.load_path)
    reduced = load_reduced(args.save_path, args.method, args.dataset,
                           args.reduction_rate, args.seed)
    out = os.path.join(args.save_path, "figures",
                       f"{args.method}_{args.dataset}_"
                       f"{args.reduction_rate}.png")
    draw_graph_pair(data, reduced, out,
                    title=f"{args.method} r={args.reduction_rate}")
    print(out)


if __name__ == "__main__":
    main()
