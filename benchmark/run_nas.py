"""NAS-correlation benchmark (reference ``benchmark/run_nas.py:17-47``)."""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


import json

from graphslim_tpu.config import get_args
from graphslim_tpu.data import get_syn_data, load
from graphslim_tpu.eval import NasEvaluator
from graphslim_tpu.eval.nas import FULL_SPACE, QUICK_SPACE


def main():
    args = get_args()
    data = load(args.dataset, setting=args.setting, split=args.split,
                seed=args.seed, data_dir=args.load_path,
                pre_norm=args.pre_norm)
    reduced = get_syn_data(args.save_path, args.method, args.dataset,
                           args.reduction_rate, args.seed,
                           threshold=args.threshold)
    space = QUICK_SPACE if args.verbose else FULL_SPACE
    nas = NasEvaluator(data, args, space=space)
    out = nas.correlation(reduced)
    print(json.dumps({k: (list(v) if isinstance(v, tuple) else v)
                      for k, v in out.items()}, indent=2))


if __name__ == "__main__":
    main()
