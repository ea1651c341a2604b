"""Evaluation: downstream-GNN accuracy, cross-arch grids, NAS, properties.

Replaces reference ``graphslim/evaluation/`` (``eval_agent.py``,
``nas_eval.py``, ``graph_property.py``, ``utils.py``).
"""

from graphslim_tpu.eval.evaluator import Evaluator
from graphslim_tpu.eval.nas import NasEvaluator
from graphslim_tpu.eval.property import PropertyEvaluator
from graphslim_tpu.eval.mia import inference_via_confidence, mia_attack
