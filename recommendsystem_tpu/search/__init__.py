"""Offline post-ranking score-fusion search (reference ``pso/`` and
``gaussain/``): PSO, GP refinement, GAUC engine, offline AUC metrics."""

from .metrics import Metrics, binary_label_auc, float_label_auc  # noqa: F401
from .reader import Reader  # noqa: F401
from .pso import BASE_PARAMS, PSO, calc_fusion_scores  # noqa: F401
from .gauc import (GaucEngine, cal_mixed_score, default_bound_x,  # noqa: F401
                   filter_user_group_sizes, group_auc)
from .gp import GPSearch  # noqa: F401
