"""Distributed sparse-embedding engine — TPU-native replacement for the
external tensornet parameter-server runtime (SURVEY §2.8)."""

from .feature_column import (  # noqa: F401
    CategoryColumn,
    EmbeddingColumn,
    Feature,
    FeatureSlot,
    category_column,
    embedding_column,
)
from .optimizers import SparseAdaGrad, SparseAdam, make_sparse_optimizer  # noqa: F401
from .engine import EmbeddingFeatures, IdBatch, all_to_all_lookup  # noqa: F401
