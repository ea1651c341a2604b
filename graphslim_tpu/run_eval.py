"""Evaluation-only entry point: load a saved reduced triple, evaluate.

Re-design of reference ``graphslim/run_eval.py`` (SURVEY.md §3.4):
``python -m graphslim_tpu.run_eval -D cora -M gcond [--eval_model GCN]``.
"""

from __future__ import annotations

from graphslim_tpu import utils
from graphslim_tpu.config import get_args
from graphslim_tpu.data import get_syn_data, load
from graphslim_tpu.eval import Evaluator


def main():
    args = get_args()
    data = load(args.dataset, setting=args.setting, split=args.split,
                seed=args.seed, data_dir=args.load_path,
                pre_norm=args.pre_norm)
    utils.seed_everything(args.seed)
    reduced = get_syn_data(args.save_path, args.method, args.dataset,
                           args.reduction_rate, args.seed,
                           model_type=args.eval_model,
                           threshold=args.threshold,
                           attack=args.attack)
    evaluator = Evaluator(data, args)
    if args.dist_devices > 1:
        from graphslim_tpu.dist import make_mesh
        evaluator.enable_distributed(make_mesh(args.dist_devices))
    (mean, std), _ = evaluator.evaluate(reduced, args.eval_model,
                                        verbose=args.verbose)
    print(f"{args.method} on {args.dataset} r={args.reduction_rate} "
          f"[{args.eval_model}]: {mean * 100:.2f} ± {std * 100:.2f}")
    return mean, std


if __name__ == "__main__":
    main()
