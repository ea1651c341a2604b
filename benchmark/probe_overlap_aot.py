"""AOT schedule evidence for the halo-SpMM exchange/compute overlap.

Compiles the 8-shard ragged-halo SpMM for a REAL v5e 2x4 topology
(``jax.experimental.topologies`` — no chips needed) and checks where the
scheduler placed the interior aggregation relative to the collective:

* ppermute path: XLA decomposes each round into async
  ``collective-permute-start``/``-done`` pairs, and the latency-hiding
  scheduler places the interior gather+scatter-add BETWEEN start and
  done — the overlap the BASELINE north-star asks for, visible in the
  compiled schedule (``is_scheduled=true`` modules list instructions in
  execution order).
* ragged-all-to-all path: lowers to a SYNCHRONOUS op on current XLA
  (no async decomposition for ragged-all-to-all yet), so the interior
  work runs after the exchange. It moves exact per-pair bytes, but
  cannot overlap until XLA grows async support.

Run: python benchmark/probe_overlap_aot.py
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def compile_and_locate(use_ragged: bool) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from graphslim_tpu import graph as G
    from graphslim_tpu.dist.spmm import (partition_rows_halo_ragged,
                                         shard_spmm_halo_ragged)

    rng = np.random.default_rng(1)
    n, d = 4096, 128
    src = np.arange(n)
    ei = np.concatenate([
        np.stack([src, (src + 1) % n]),
        np.stack([src, (src + 7) % n]),
        rng.integers(0, n, size=(2, 2000)),
    ], axis=1)
    adj = G.gcn_norm(G.from_edge_index(ei, n, symmetrize=True))
    hp = partition_rows_halo_ragged(adj, 8)
    topo = topologies.get_topology_desc("v5e:2x4")
    mesh = Mesh(np.array(topo.devices).reshape(8), ("data",))
    n_pad = hp.base.row_local.shape[0] * hp.base.rows_per_shard

    def fn(x):
        return shard_spmm_halo_ragged(mesh, hp, x, padded=True,
                                      use_ragged=use_ragged)

    hlo = jax.jit(fn).lower(
        jax.ShapeDtypeStruct((n_pad, d), jnp.float32)).compile().as_text()
    lines = hlo.splitlines()
    entry = next(i for i, l in enumerate(lines) if l.startswith("ENTRY "))
    out = {"starts": [], "dones": [], "scatter_adds": [], "sync_a2a": []}
    for i in range(entry, len(lines)):
        l = lines[i]
        if "collective-permute-start(" in l:
            out["starts"].append(i)
        elif "collective-permute-done(" in l:
            out["dones"].append(i)
        elif "ragged-all-to-all(" in l:
            out["sync_a2a"].append(i)
        elif "scatter-add" in l and re.search(r"= \S+ fusion\(", l):
            out["scatter_adds"].append(i)
    return out


def main() -> int:
    pp = compile_and_locate(use_ragged=False)
    print("ppermute path: starts", pp["starts"][:6], "... dones",
          pp["dones"][:3], "scatter-adds", pp["scatter_adds"])
    interior = pp["scatter_adds"][0] if pp["scatter_adds"] else None
    overlapped = bool(interior is not None and pp["starts"]
                      and pp["dones"]
                      and min(pp["starts"]) < interior < max(pp["dones"]))
    print("interior scatter-add scheduled INSIDE the start/done window:",
          overlapped)
    rg = compile_and_locate(use_ragged=True)
    print("ragged path: sync ragged-all-to-all at", rg["sync_a2a"],
          "(no async pair on current XLA)")
    return 0 if overlapped else 1


if __name__ == "__main__":
    raise SystemExit(main())
