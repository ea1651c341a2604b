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
 canvas {{ border: 1px solid #ccc; cursor: grab; }}
 select {{ font-size: 14px; margin-right: 12px; }}
 #tip {{ position: absolute; background: #222; color: #fff;
         padding: 3px 8px; border-radius: 4px; font-size: 12px;
         pointer-events: none; display: none; }}
</style></head>
<body>
<h2>graphslim-tpu &mdash; reduced graph browser</h2>
<label>method <select id="method"></select></label>
<label>dataset <select id="dataset"></select></label>
<label>rate <select id="rate"></select></label>
<span id="meta"></span>
<div id="tip"></div>
<br><canvas id="c" width="880" height="620"></canvas>
<script>
// pyvis-style live physics: continuous simulation, draggable nodes,
// hover tooltips (reference interface/vis_graphslim.py:26-117)
const GRAPHS = {graphs_json};
const COLORS = ["#4e79a7","#f28e2b","#e15759","#76b7b2","#59a14f",
                "#edc948","#b07aa1","#ff9da7","#9c755f","#bab0ac"];
const selM = document.getElementById("method"),
      selD = document.getElementById("dataset"),
      selR = document.getElementById("rate"),
      tip = document.getElementById("tip"),
      cv = document.getElementById("c"), ctx = cv.getContext("2d");
const keys = Object.keys(GRAPHS).map(k => {{
  const [method, stem] = k.split("/");
  const parts = stem.split("_");
  const seed = parts.pop(), rate = parts.pop();
  return {{key: k, method: method, dataset: parts.join("_"),
           rate: rate}};
}});
function fill(sel, vals) {{
  const cur = sel.value;
  sel.innerHTML = "";
  vals.forEach(v => {{
    const o = document.createElement("option");
    o.value = v; o.text = v; sel.add(o);
  }});
  if (vals.includes(cur)) sel.value = cur;
}}
function refreshSelectors() {{
  fill(selM, [...new Set(keys.map(k => k.method))]);
  fill(selD, [...new Set(keys.filter(k => k.method === selM.value)
                             .map(k => k.dataset))]);
  fill(selR, [...new Set(keys.filter(k => k.method === selM.value &&
                                          k.dataset === selD.value)
                             .map(k => k.rate))]);
}}
let g = null, px = [], vel = [], drag = -1, warm = 0;
function pickGraph() {{
  const hit = keys.find(k => k.method === selM.value &&
                             k.dataset === selD.value &&
                             k.rate === selR.value);
  if (!hit) return;
  g = GRAPHS[hit.key];
  document.getElementById("meta").textContent =
    `${{g.nodes.length}} nodes, ${{g.edges.length}} edges`;
  px = g.nodes.map(() => [60 + Math.random()*760,
                          60 + Math.random()*500]);
  vel = g.nodes.map(() => [0, 0]);
  warm = 0;
}}
function stepPhysics() {{
  const N = g.nodes.length;
  const damp = warm < 200 ? 0.6 : 0.85;
  for (let i = 0; i < N; i++) for (let j = i+1; j < N; j++) {{
    let dx = px[i][0]-px[j][0], dy = px[i][1]-px[j][1];
    let d2 = Math.max(dx*dx+dy*dy, 25), d = Math.sqrt(d2), f = 1200/d2;
    vel[i][0] += f*dx/d; vel[i][1] += f*dy/d;
    vel[j][0] -= f*dx/d; vel[j][1] -= f*dy/d;
  }}
  g.edges.forEach(([a,b]) => {{
    let dx = px[a][0]-px[b][0], dy = px[a][1]-px[b][1];
    let d = Math.max(Math.sqrt(dx*dx+dy*dy), 1), f = (d-40)*0.02;
    vel[a][0] -= f*dx/d; vel[a][1] -= f*dy/d;
    vel[b][0] += f*dx/d; vel[b][1] += f*dy/d;
  }});
  // mild centering so disconnected pieces stay on screen
  for (let i = 0; i < N; i++) {{
    vel[i][0] += (440 - px[i][0]) * 0.0005;
    vel[i][1] += (310 - px[i][1]) * 0.0005;
    if (i === drag) continue;
    px[i][0] = Math.min(870, Math.max(10, px[i][0]+vel[i][0]*0.5));
    px[i][1] = Math.min(610, Math.max(10, px[i][1]+vel[i][1]*0.5));
    vel[i][0] *= damp; vel[i][1] *= damp;
  }}
  warm++;
}}
function draw() {{
  ctx.clearRect(0, 0, 880, 620);
  ctx.strokeStyle = "rgba(120,120,120,0.25)";
  g.edges.forEach(([a,b]) => {{
    ctx.beginPath(); ctx.moveTo(px[a][0], px[a][1]);
    ctx.lineTo(px[b][0], px[b][1]); ctx.stroke();
  }});
  g.nodes.forEach((lab, i) => {{
    ctx.fillStyle = COLORS[lab % COLORS.length];
    ctx.beginPath(); ctx.arc(px[i][0], px[i][1], 5, 0, 6.3); ctx.fill();
  }});
}}
function loop() {{
  if (g) {{ stepPhysics(); draw(); }}
  requestAnimationFrame(loop);
}}
function nodeAt(x, y) {{
  for (let i = 0; i < px.length; i++) {{
    const dx = px[i][0]-x, dy = px[i][1]-y;
    if (dx*dx + dy*dy < 64) return i;
  }}
  return -1;
}}
cv.onmousedown = e => {{
  const r = cv.getBoundingClientRect();
  drag = nodeAt(e.clientX-r.left, e.clientY-r.top);
}};
cv.onmousemove = e => {{
  const r = cv.getBoundingClientRect();
  const x = e.clientX-r.left, y = e.clientY-r.top;
  if (drag >= 0) {{ px[drag] = [x, y]; vel[drag] = [0, 0]; warm = 0; }}
  const i = nodeAt(x, y);
  if (i >= 0) {{
    tip.style.display = "block";
    tip.style.left = (e.pageX + 12) + "px";
    tip.style.top = (e.pageY + 12) + "px";
    tip.textContent = `node ${{i}} · class ${{g.nodes[i]}}`;
  }} else tip.style.display = "none";
}};
cv.onmouseup = () => drag = -1;
selM.onchange = () => {{ refreshSelectors(); pickGraph(); }};
selD.onchange = () => {{ refreshSelectors(); pickGraph(); }};
selR.onchange = pickGraph;
refreshSelectors(); pickGraph(); loop();
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
