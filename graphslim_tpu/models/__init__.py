"""Model zoo registry.

Replaces reference ``graphslim/models/__init__.py`` + the ``eval(model_type)``
pattern (``evaluation/eval_agent.py:159``) with an explicit factory.
"""

from graphslim_tpu.models.base import (
    GNNModel, ModelConfig, aggregate, aggregate_block, layer_aggregate,
)
from graphslim_tpu.models.zoo import MLP, GCN, SGC, APPNP, Cheby, GraphSage
from graphslim_tpu.models.gat import GAT
from graphslim_tpu.models.sgformer import SGFormer
from graphslim_tpu.models.trainer import (
    TrainConfig, fit_with_val, fit_multi_seed, evaluate, prepare_adj,
)

MODEL_REGISTRY = {
    "MLP": MLP,
    "GCN": GCN,
    "SGC": SGC,
    "APPNP": APPNP,
    "Cheby": Cheby,
    "ChebNet": Cheby,
    "GraphSage": GraphSage,
    "SAGE": GraphSage,
    "GAT": GAT,
    "SGFormer": SGFormer,
}


def get_model(name: str, cfg: ModelConfig) -> GNNModel:
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](cfg)
