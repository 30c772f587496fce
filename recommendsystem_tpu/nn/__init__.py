"""Canonical layer library — one home for the layers the reference duplicates
across ``InteractingLayer.py``, ``din.py``, ``staytime/layer.py``,
``rough_rank/layer.py`` and ``rank/multi_head/interacting_layer.py``."""

from .mlp import Dense, DNN, MultiLayerDense, resolve_activation  # noqa: F401
from .interacting import InteractingLayer  # noqa: F401
from .din import DINAttention, DINPool, sequence_mask, MASK_PAD  # noqa: F401
from .dcn import DeepCrossLayer, CrossNet  # noqa: F401
from .fm import FMLayer3D, DeepFMLayer, FFMBlock, fm_cross_term  # noqa: F401
from .senet import SENet  # noqa: F401
from .ppnet import GateTower, PPNetGateBank  # noqa: F401
from .moe import MMOE, PLE  # noqa: F401
from .similarity import Similarity, kd_loss  # noqa: F401
from .moe_stacked import (MMOEStacked, PLEStacked, GatedExpert,  # noqa: F401
                          expert_shardings, stacked_gated_experts)  # noqa: F401
