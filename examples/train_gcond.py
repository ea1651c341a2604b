"""Example: GCond condensation on cora (SGC matching model).

Analog of reference ``examples/train_gcond.py``; uses the reference's
recommended hyperparameters from METHOD_CONFIGS automatically.
"""

from graphslim_tpu.config import Args, finalize
from graphslim_tpu.data import load
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.reduce import create_reducer


def main():
    args = finalize(Args(dataset="cora", method="gcond",
                         reduction_rate=0.25, epochs=100,
                         save_path="checkpoints"),
                    explicit={"reduction_rate", "epochs"})
    data = load(args.dataset, split=args.split, seed=args.seed,
                data_dir=args.load_path, pre_norm=args.pre_norm)
    reduced = create_reducer("gcond", data, args).reduce(data,
                                                         verbose=True)
    (mean, std), _ = Evaluator(data, args).evaluate(reduced, "GCN",
                                                    verbose=True)
    print(f"gcond cora r=0.25: {mean * 100:.2f} ± {std * 100:.2f}")


if __name__ == "__main__":
    main()
