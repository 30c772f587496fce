"""Finish-rate DeepFM + bias-gated deep tower (``rank/finish/videodnn.py``).

Graph (``videodnn.py:69-144``): 32-d slot embeddings; general slots use cols
[0:16), bias slots use cols [0:16), the wide user slot contributes its tail
[16:) to the general group (``:92-94``); FM (order-2 + linear) over the
general concat (``:100-102``); deep tower where from layer 1 on the input is
multiplied by a bias-tower gate ``sigmoid(Dense(relu(Dense(bias))))*2``
(``:107-133``); final gate after the loop; concat FM -> Dense(1, sigmoid).
Task: ``video_id_rank_finish_nb_lr_rongh_bundle`` (``:136``).
Optimizers: sparse/dense Adam 1e-3 (``videodnn.py:64``, ``model.py:41``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import optax

from .. import nn as rnn
from ..embedding import EmbeddingFeatures, SparseAdam, category_column, embedding_column
from ..train import losses as L
from ..train import metrics as M
from .base import ModelBundle, register_model

TASK = "video_id_rank_finish_nb_lr_rongh_bundle"
REG = (1e-5, 1e-5)   # L1L2 on every deep/bias kernel (videodnn.py:108-129)


class DeepFMModule(nn.Module):
    bias_slots: Tuple[str, ...]
    general_slots: Tuple[str, ...]
    wide_tail_slot: Optional[str]          # slot whose [16:) tail joins general
    deep_hidden_units: Tuple[int, ...] = (64, 32)

    @nn.compact
    def __call__(self, embs: Dict[str, jnp.ndarray], training: bool = False):
        bias_inputs = [embs[s][:, 0:16] for s in self.bias_slots]
        general_inputs = [embs[s][:, 0:16] for s in self.general_slots]
        if self.wide_tail_slot is not None:
            general_inputs.append(embs[self.wide_tail_slot][:, 16:])

        general = jnp.concatenate(general_inputs, axis=1)
        fm = rnn.DeepFMLayer(name="fm")(general)
        bias = jnp.concatenate(bias_inputs, axis=1)

        x = general
        prev_units = -1
        for i, unit in enumerate(self.deep_hidden_units):
            if i > 0:
                g = rnn.Dense(prev_units, activation="relu",
                              name=f"bais_dnn_one_{i}", kernel_regularizer=REG)(bias)
                g = rnn.Dense(prev_units, activation="sigmoid",
                              name=f"bais_dnn_two_{i}", kernel_regularizer=REG)(g) * 2
                x = x * g
            x = rnn.Dense(unit, activation="relu", name=f"dnn_{i}",
                          kernel_regularizer=REG)(x)
            prev_units = unit

        g = rnn.Dense(prev_units, activation="relu", name="bais_dnn_one_3",
                      kernel_regularizer=REG)(bias)
        g = rnn.Dense(prev_units, activation="sigmoid", name="bais_dnn_two_3",
                      kernel_regularizer=REG)(g) * 2
        x = x * g

        deep = jnp.concatenate([x, fm], axis=1)
        out = rnn.Dense(1, activation="sigmoid", name="pred")(deep)
        return {TASK: out}


@register_model("finish")
def create_finish(slots: Optional[Sequence[str]] = None,
                  bias_slots: Optional[Sequence[str]] = None,
                  bucket_size: int = 25600,
                  dim: int = 32,
                  deep_hidden_units: Tuple[int, ...] = (64, 32),
                  num_shards: int = 1,
                  table_dtype=None,
                  compute_dtype=None,
                  opt_state_dtype=None,
                  sparse_lr: float = 1e-3,
                  dense_lr: float = 1e-3) -> ModelBundle:
    if slots is None:
        slots = [str(s) for s in range(3000, 3040)]
    if bias_slots is None:
        bias_slots = tuple(slots[:8])
    wide_tail = bias_slots[0] if bias_slots else None
    general = tuple(s for s in slots if s not in set(bias_slots))

    cols = [embedding_column(category_column(s, bucket_size), dim, combiner="mean")
            for s in slots]
    emb = EmbeddingFeatures(cols, SparseAdam(learning_rate=sparse_lr,
                                       **({} if opt_state_dtype is None
                                          else {"state_dtype": opt_state_dtype})),
                            num_shards=num_shards, group_tables=True,
                            # measured-best storage size: small
                            # prefetchable storages gather ~6x
                            # faster (probe25: 92.3 -> 82.2 ms/step at batch 32768)
                            max_group_bytes=4 << 20,
                            **({} if table_dtype is None else {"table_dtype": table_dtype}))

    return ModelBundle(
        name="finish",
        module=DeepFMModule(bias_slots=tuple(bias_slots), general_slots=general,
                            wide_tail_slot=wide_tail,
                            deep_hidden_units=tuple(deep_hidden_units)),
        embedding=emb,
        losses={TASK: L.cross_entropy_sum_mean},
        metrics={TASK: [M.binary_accuracy(), M.auc()]},
        dense_optimizer=optax.adam(dense_lr, b1=0.9, b2=0.999, eps=1e-8),
        compute_dtype=compute_dtype,
    )
