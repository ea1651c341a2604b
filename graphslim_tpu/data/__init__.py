"""Dataset layer: loaders, splits, transforms, artifact store, attacks.

TPU-native replacement for reference ``graphslim/dataset/``
(``loader.py:39-97``, ``utils.py``, ``convertor.py``, ``attack.py``).

Because this build environment has zero network egress, every reference
dataset has a deterministic synthetic twin with matching scale, class count,
feature dimension and homophily profile (:mod:`graphslim_tpu.data.synthetic`)
plus an on-disk ingestion path (:mod:`graphslim_tpu.data.ingest`) that reads
real GraphSAINT/npz-format files when a data directory is provided.
"""

from graphslim_tpu.data.loader import load, DATASET_SPECS, DatasetSpec
from graphslim_tpu.data.artifacts import (
    save_reduced, load_reduced, get_syn_data, sparsify,
)
