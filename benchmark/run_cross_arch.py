"""Cross-architecture benchmark: evaluate a reduced graph across the zoo.

Re-design of reference ``benchmark/run_cross_arch.py``:
``python benchmark/run_cross_arch.py -D cora -M gcond``.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


import json

from graphslim_tpu.config import get_args
from graphslim_tpu.data import get_syn_data, load
from graphslim_tpu.eval import Evaluator


def main():
    args = get_args()
    data = load(args.dataset, setting=args.setting, split=args.split,
                seed=args.seed, data_dir=args.load_path,
                pre_norm=args.pre_norm)
    reduced = get_syn_data(args.save_path, args.method, args.dataset,
                           args.reduction_rate, args.seed,
                           threshold=args.threshold)
    table = Evaluator(data, args).train_cross(reduced,
                                              verbose=args.verbose)
    print(json.dumps({k: [round(v[0] * 100, 2), round(v[1] * 100, 2)]
                      for k, v in table.items()}, indent=2))


if __name__ == "__main__":
    main()
