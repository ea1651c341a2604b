"""Example: coreset sparsification on cora with a KCenter selector.

Analog of reference ``examples/train_node_sparsification.py``.
"""

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


from graphslim_tpu.config import Args, finalize
from graphslim_tpu.data import load
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.reduce import create_reducer


def main():
    args = finalize(Args(dataset="cora", method="kcenter",
                         reduction_rate=0.5, save_path="checkpoints"))
    data = load(args.dataset, split=args.split, seed=args.seed,
                data_dir=args.load_path)
    reduced = create_reducer("kcenter", data, args).reduce(data,
                                                           verbose=True)
    (mean, std), _ = Evaluator(data, args).evaluate(reduced, "GCN",
                                                    verbose=True)
    print(f"kcenter cora r=0.5: {mean * 100:.2f} ± {std * 100:.2f}")


if __name__ == "__main__":
    main()
