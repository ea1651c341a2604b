"""Property-preservation benchmark
(reference ``benchmark/graph_property.py``)."""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


import json

from graphslim_tpu.config import get_args
from graphslim_tpu.data import get_syn_data, load
from graphslim_tpu.eval import PropertyEvaluator


def main():
    args = get_args()
    data = load(args.dataset, setting=args.setting, split=args.split,
                seed=args.seed, data_dir=args.load_path,
                pre_norm=args.pre_norm)
    reduced = get_syn_data(args.save_path, args.method, args.dataset,
                           args.reduction_rate, args.seed,
                           threshold=args.threshold)
    out = PropertyEvaluator(data, args).compare(reduced)
    print(json.dumps(out, indent=2, default=float))


if __name__ == "__main__":
    main()
