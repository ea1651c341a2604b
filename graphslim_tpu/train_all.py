"""Canonical pipeline entry point: args → dataset → reduce → evaluate.

Re-design of reference ``graphslim/train_all.py:19-38``.  Run as
``python -m graphslim_tpu.train_all -D cora -M gcond``.
"""

from __future__ import annotations

import logging

from graphslim_tpu import utils
from graphslim_tpu.config import Args, get_args
from graphslim_tpu.data import load
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.reduce import create_reducer
from graphslim_tpu.tracking import build_tracker, graph_summary

log = logging.getLogger("graphslim_tpu")


def run(args: Args):
    graph = load(args.dataset, setting=args.setting, split=args.split,
                 seed=args.seed, data_dir=args.load_path,
                 pre_norm=args.pre_norm)
    utils.seed_everything(args.seed)
    if args.attack is not None:
        from graphslim_tpu.data.attack import attack
        graph = attack(graph, args)
    tracker = build_tracker(args)
    tracker.log_graph("original", graph_summary(
        graph.n_nodes, graph.adj.nnz))
    agent = create_reducer(args.method, graph, args)
    if args.dist_devices > 1 and hasattr(agent, "enable_distributed"):
        agent.enable_distributed(args.dist_devices)
    from graphslim_tpu.profiling import trace
    with trace(f"{args.save_path}/traces/{args.method}_{args.dataset}",
               enabled=args.profile):
        reduced = agent.reduce(graph, verbose=args.verbose)
    tracker.log_graph("reduced", graph_summary(
        reduced.n_syn,
        int((reduced.dense_adj() != 0).sum()) if reduced.adj is not None
        else reduced.n_syn))
    evaluator = Evaluator(graph, args)
    if args.dist_devices > 1:
        # node-sharded full-graph val/test forwards over the device mesh
        # (edge-cut partition + ragged halo exchange, dist/spmm.py)
        from graphslim_tpu.dist import make_mesh
        evaluator.enable_distributed(make_mesh(args.dist_devices))
    (mean, std), _ = evaluator.evaluate(reduced, args.eval_model,
                                        verbose=args.verbose)
    tracker.log_metrics({"acc_mean": mean, "acc_std": std})
    tracker.finish()
    print(f"{args.method} on {args.dataset} r={args.reduction_rate}: "
          f"{mean * 100:.2f} ± {std * 100:.2f}")
    return mean, std


def main():
    run(get_args())


if __name__ == "__main__":
    main()
