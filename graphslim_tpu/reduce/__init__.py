"""Reduction methods: sparsification, coarsening, condensation.

Replaces reference ``graphslim/{sparsification,coarsening,condensation}/``
+ ``graphslim/reduction/registry.py``.
"""

from graphslim_tpu.reduce.registry import (
    create_reducer, get_method_spec, list_methods, MethodSpec,
)
from graphslim_tpu.reduce.base import Reducer, class_budgets
