"""Example: variation-neighborhoods coarsening on cora.

Analog of reference ``examples/train_coarsen.py``: load a dataset, run the
VariationNeighborhoods coarsener, evaluate the coarse graph with a GCN.
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
    args = finalize(Args(dataset="cora",
                         method="variation_neighborhoods",
                         reduction_rate=0.5, save_path="checkpoints"),
                    explicit={"reduction_rate"})
    data = load(args.dataset, split=args.split, seed=args.seed,
                data_dir=args.load_path, pre_norm=args.pre_norm)
    agent = create_reducer("variation_neighborhoods", data, args)
    reduced = agent.reduce(data, verbose=True)
    (mean, std), _ = Evaluator(data, args).evaluate(reduced, "GCN",
                                                    verbose=True)
    print(f"variation_neighborhoods cora r=0.5: "
          f"{mean * 100:.2f} ± {std * 100:.2f}")


if __name__ == "__main__":
    main()
