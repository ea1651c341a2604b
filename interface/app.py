"""Interactive reduced-graph browser.

Analog of the reference's Streamlit app (``interface/vis_graphslim.py:
26-117``) without the Streamlit/pyvis dependency (not available in this
environment): generates a self-contained HTML page with an embedded
force-directed D3-style canvas renderer (vanilla JS, no CDN fetches) for
every pre-computed reduced graph found under
``{save_path}/reduced_graph/{method}/``.

Usage::

    python interface/app.py --save_path checkpoints --dataset cora
    # -> writes interface/reduced_graphs.html, open in any browser
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host-side tool — no TPU

from graphslim_tpu import graph as G  # noqa: E402
from graphslim_tpu.data.artifacts import load_reduced

MAX_NODES = 300

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>graphslim-tpu reduced graphs</title>
<style>
 body {{ font-family: sans-serif; margin: 20px; }}
 canvas {{ border: 1px solid #ccc; }}
 select {{ font-size: 14px; margin-right: 12px; }}
</style></head>
<body>
<h2>graphslim-tpu &mdash; reduced graph browser</h2>
<select id="pick"></select>
<span id="meta"></span>
<br><br><canvas id="c" width="880" height="620"></canvas>
<script>
const GRAPHS = {graphs_json};
const COLORS = ["#4e79a7","#f28e2b","#e15759","#76b7b2","#59a14f",
                "#edc948","#b07aa1","#ff9da7","#9c755f","#bab0ac"];
const pick = document.getElementById("pick");
Object.keys(GRAPHS).forEach(k => {{
  const o = document.createElement("option"); o.value = k; o.text = k;
  pick.add(o);
}});
function render(name) {{
  const g = GRAPHS[name];
  document.getElementById("meta").textContent =
    `${{g.nodes.length}} nodes, ${{g.edges.length}} edges`;
  const cv = document.getElementById("c"), ctx = cv.getContext("2d");
  const N = g.nodes.length;
  let px = g.nodes.map(() => [Math.random()*880, Math.random()*620]);
  let vel = g.nodes.map(() => [0, 0]);
  for (let it = 0; it < 150; it++) {{
    for (let i = 0; i < N; i++) for (let j = i+1; j < N; j++) {{
      let dx = px[i][0]-px[j][0], dy = px[i][1]-px[j][1];
      let d2 = Math.max(dx*dx+dy*dy, 25);
      let f = 1200/d2;
      let d = Math.sqrt(d2);
      vel[i][0] += f*dx/d; vel[i][1] += f*dy/d;
      vel[j][0] -= f*dx/d; vel[j][1] -= f*dy/d;
    }}
    g.edges.forEach(([a,b]) => {{
      let dx = px[a][0]-px[b][0], dy = px[a][1]-px[b][1];
      let d = Math.max(Math.sqrt(dx*dx+dy*dy), 1);
      let f = (d-40)*0.02;
      vel[a][0] -= f*dx/d; vel[a][1] -= f*dy/d;
      vel[b][0] += f*dx/d; vel[b][1] += f*dy/d;
    }});
    for (let i = 0; i < N; i++) {{
      px[i][0] = Math.min(860, Math.max(20, px[i][0]+vel[i][0]*0.5));
      px[i][1] = Math.min(600, Math.max(20, px[i][1]+vel[i][1]*0.5));
      vel[i][0] *= 0.6; vel[i][1] *= 0.6;
    }}
  }}
  ctx.clearRect(0, 0, 880, 620);
  ctx.strokeStyle = "rgba(120,120,120,0.25)";
  g.edges.forEach(([a,b]) => {{
    ctx.beginPath(); ctx.moveTo(px[a][0], px[a][1]);
    ctx.lineTo(px[b][0], px[b][1]); ctx.stroke();
  }});
  g.nodes.forEach((lab, i) => {{
    ctx.fillStyle = COLORS[lab % COLORS.length];
    ctx.beginPath(); ctx.arc(px[i][0], px[i][1], 4, 0, 6.3); ctx.fill();
  }});
}}
pick.onchange = () => render(pick.value);
render(pick.value);
</script></body></html>
"""


def graph_blob(reduced) -> dict:
    labels = np.asarray(reduced.labels)
    if labels.ndim == 2:
        labels = labels.argmax(1)
    n = min(len(labels), MAX_NODES)
    adj = reduced.adj
    edges = []
    if isinstance(adj, G.SparseAdj):
        row, col = np.asarray(adj.row), np.asarray(adj.col)
        mask = (row < n) & (col < n) & (row < col)
        edges = np.stack([row[mask], col[mask]], 1).tolist()
    elif adj is not None:
        a = np.asarray(adj)
        if a.ndim == 3:
            a = a[0]
        thresh = max(float(a.mean()), 1e-6)
        r, c = np.nonzero(np.triu(a, 1) > thresh)
        mask = (r < n) & (c < n)
        edges = np.stack([r[mask], c[mask]], 1).tolist()
    return {"nodes": labels[:n].astype(int).tolist(), "edges": edges}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save_path", default="checkpoints")
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "reduced_graphs.html"))
    args = ap.parse_args()

    graphs = {}
    pattern = os.path.join(args.save_path, "reduced_graph", "*", "*.npz")
    for path in sorted(glob.glob(pattern)):
        method = os.path.basename(os.path.dirname(path))
        stem = os.path.basename(path)[:-4]
        if args.dataset and not stem.startswith(args.dataset):
            continue
        parts = stem.rsplit("_", 2)
        try:
            reduced = load_reduced(args.save_path, method, parts[0],
                                   float(parts[1]), int(parts[2]))
        except Exception:
            continue
        graphs[f"{method}/{stem}"] = graph_blob(reduced)
    if not graphs:
        print(f"no reduced graphs under {pattern}")
        return
    with open(args.out, "w") as f:
        f.write(_PAGE.format(graphs_json=json.dumps(graphs)))
    print(f"wrote {args.out} ({len(graphs)} graphs)")


if __name__ == "__main__":
    main()
