"""Torch-CPU replica of the reference GCond outer step, for anchoring
``bench.py``'s ``vs_baseline`` with a *measured* number.

The actual reference cannot run here (torch_sparse/PyG absent, zero
egress), so this replicates its per-outer-step compute at identical
shapes (ogbn-arxiv r=0.01 profile: 40 classes × 256-target blocks with
[10, 5] fanouts, SGC condense model d=128→256→40, PGE adjacency over
n_syn=1354, cosine match loss) using plain torch ops:

* per class: gather sampled-block features, SGC forward, real-grad via
  autograd (detached), synthetic forward on the PGE adjacency,
  create_graph=True grad, per-parameter cosine match
  (``gcond_base.py:156-241`` + ``condensation/utils.py:12-106``);
* PGE: the reference's chunked pair-MLP over n_syn² pairs
  (``parametrized_adj.py:30-71``);
* one Adam step on feat_syn.

Differences from the real reference: no CPU NeighborSampler worker pool
(we pre-gather random blocks — this *flatters* the replica, since the
reference also pays sampling), no BatchNorm in PGE.  The replica is a
LOWER bound on reference CPU step time.

Prints one JSON line: {"torch_cpu_step_s": ..., "steps_per_s": ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn.functional as F

N, D, HID, C = 169_343, 128, 256, 40
N_SYN = 1354
BATCH, FAN = 256, (10, 5)
BLOCK = BATCH * (FAN[0] + 1) * (FAN[1] + 1)   # gathered rows per class


def match_loss_cos(gs, gr):
    total = 0.0
    for a, b in zip(gs, gr):
        a2 = a.flatten(1) if a.dim() > 1 else a[None]
        b2 = b.flatten(1) if b.dim() > 1 else b[None]
        num = (a2 * b2).sum(0)
        den = a2.norm(dim=0) * b2.norm(dim=0) + 1e-6
        total = total + (1.0 - num / den).sum()
    return total


def main():
    torch.manual_seed(0)
    feat = torch.randn(N, D)
    labels = torch.randint(0, C, (N,))
    feat_syn = torch.randn(N_SYN, D, requires_grad=True)
    labels_syn = torch.randint(0, C, (N_SYN,))
    # SGC params (ntrans=1): one linear d->C; hidden unused by SGC but
    # the reference's default condense model for arxiv is SGC ntrans=1
    w = torch.randn(D, C, requires_grad=True) * 0.1
    w.retain_grad()
    pge = torch.nn.Sequential(
        torch.nn.Linear(2 * D, HID), torch.nn.ReLU(),
        torch.nn.Linear(HID, HID), torch.nn.ReLU(),
        torch.nn.Linear(HID, 1))
    opt = torch.optim.Adam([feat_syn], lr=1e-4)

    def pge_adj():
        # chunked pair scoring (reference parametrized_adj.py:41-55)
        rows = []
        idx = torch.arange(N_SYN)
        for s in range(0, N_SYN, 512):
            a = feat_syn[s:s + 512][:, None, :].expand(-1, N_SYN, -1)
            b = feat_syn[None, :, :].expand(a.shape[0], -1, -1)
            pair = torch.cat([a, b], -1).reshape(-1, 2 * D)
            rows.append(pge(pair).reshape(-1, N_SYN))
        adj = torch.sigmoid(torch.cat(rows))
        adj = (adj + adj.T) / 2
        return adj * (1 - torch.eye(N_SYN))

    def step():
        adj_syn = pge_adj()
        deg = adj_syn.sum(1) + 1
        dinv = deg.rsqrt()
        adj_norm = dinv[:, None] * (adj_syn + torch.eye(N_SYN)) * \
            dinv[None, :]
        loss_total = 0.0
        for c in range(C):
            # real side: sampled block (pre-gathered; flatters replica)
            ids = torch.randint(0, N, (BLOCK,))
            xb = feat[ids]
            # 2-hop mean aggregation within the block (dense surrogates
            # of the two block SpMMs)
            h = xb.reshape(BATCH, -1, D).mean(1)
            out = h @ w
            lr_ = F.nll_loss(F.log_softmax(out, 1), labels[ids[:BATCH]])
            gw_real = torch.autograd.grad(lr_, [w], retain_graph=True)
            gw_real = [g.detach() for g in gw_real]
            # syn side: SGC fwd on the learned adjacency, create_graph
            hs = adj_norm @ (adj_norm @ feat_syn)
            outs = hs @ w
            mask = labels_syn == c
            ls = F.nll_loss(F.log_softmax(outs[mask], 1),
                            labels_syn[mask])
            gw_syn = torch.autograd.grad(ls, [w], create_graph=True,
                                         retain_graph=True)
            loss_total = loss_total + match_loss_cos(gw_syn, gw_real)
        opt.zero_grad()
        loss_total.backward(retain_graph=True)
        opt.step()
        return float(loss_total)

    step()                      # warmup
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        step()
    dt = (time.time() - t0) / reps
    print(json.dumps({"torch_cpu_step_s": round(dt, 2),
                      "steps_per_s": round(1.0 / dt, 4)}))


if __name__ == "__main__":
    main()
