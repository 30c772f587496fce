"""7-task multi-head interaction ranker (``rank/multi_head/multidnn.py``).

Graph (``multidnn.py:14-212``): 8-d slot embeddings -> (B, F, 8) ->
InteractingLayer(1 layer, 8 units, 2 heads, dropout 0.2, res) + deep MLP
(32, 16) over the flattened stack -> concat -> 8 experts Dense(32, relu,
TruncatedNormal(0.001), L2 0.01) of which the FIRST 7 are used
(``:82-92``) -> 7 softmax gates Dense(7) -> per-task weighted expert sum ->
7 sigmoid heads: like, click_comment, comment, click_sharing, follow,
click_avatar, unlike (``:118-210``).  The declared label order
(``MultiLabelInfo.label_list``, ``:209-210``) is ``TASKS`` below.
Optimizers: sparse Adam 5e-5 (``:235``), dense Adam 1e-5 (``model.py:52``).
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

TASKS = ("like_pred", "click_comment_pred", "comment_pred", "click_sharing_pred",
         "follow_pred", "click_avatar_pred", "unlike_pred")

_TN_INIT = nn.initializers.truncated_normal(stddev=0.001)


class MultiHeadModule(nn.Module):
    slots: Tuple[str, ...]
    deep_hidden_units: Tuple[int, ...] = (32, 16)
    expert_num: int = 7
    # stack the 8 expert Dense(32) params on a leading axis: one batched
    # einsum instead of 8 small matmuls, shardable over the model mesh axis
    stacked_experts: bool = False

    @nn.compact
    def __call__(self, embs: Dict[str, jnp.ndarray], training: bool = False,
                 dense_inputs: Optional[Dict[str, jnp.ndarray]] = None):
        emb_3d = [embs[s][:, None, :] for s in self.slots]
        all_inputs = jnp.concatenate(emb_3d, axis=1)            # (B, F, 8)

        autoint_out = rnn.InteractingLayer(
            layer_num=1, unit_num=8, head_num=2, use_dropout=True,
            dropout_rate=0.2, use_res=True, name="interacting")(
                all_inputs, training=training)
        autoint_out = autoint_out.reshape(autoint_out.shape[0], -1)

        deep = all_inputs.reshape(all_inputs.shape[0], -1)
        for i, unit in enumerate(self.deep_hidden_units):
            deep = rnn.Dense(unit, activation="relu", name=f"dnn_{i}",
                             kernel_regularizer=(1e-5, 1e-5))(deep)

        result = jnp.concatenate([deep, autoint_out], axis=1)

        # 8 experts built, first 7 consumed (multidnn.py:82-92)
        if self.stacked_experts:
            Stack = nn.vmap(rnn.Dense, in_axes=None, out_axes=0,
                            axis_size=self.expert_num + 1,
                            variable_axes={"params": 0, "losses": 0},
                            split_rngs={"params": True})
            stacked = Stack(32, activation="relu", name="experts_fc1",
                            kernel_init=_TN_INIT,
                            kernel_regularizer=(0.0, 0.01))(result)  # (8, B, 32)
            experts = jnp.transpose(stacked[:self.expert_num], (1, 0, 2))
        else:
            expert_outs = []
            for idx in range(self.expert_num + 1):
                e = rnn.Dense(32, activation="relu", name=f"expert_{idx}_fc1",
                              kernel_init=_TN_INIT,
                              kernel_regularizer=(0.0, 0.01))(result)
                expert_outs.append(e)
            experts = jnp.stack(expert_outs[0:self.expert_num], axis=1)  # (B, 7, 32)

        outputs = {}
        for idx, task in enumerate(TASKS):
            gate = rnn.Dense(self.expert_num, activation="softmax",
                             name=f"gate_{idx}_fc2", kernel_init=_TN_INIT,
                             kernel_regularizer=(0.0, 0.01))(result)   # (B, 7)
            pooled = jnp.einsum("bed,be->bd", experts, gate,
                                preferred_element_type=jnp.float32)
            outputs[task] = rnn.Dense(1, activation="sigmoid",
                                      name=task)(pooled)
        return outputs


@register_model("multi_head")
def create_multi_head(slots: Optional[Sequence[str]] = None,
                      bucket_size: int = 265000,
                      dim: int = 8,
                      num_shards: int = 1,
                      table_dtype=None,
                      compute_dtype=None,
                      opt_state_dtype=None,
                      stacked_experts: bool = False,
                      sparse_lr: float = 5e-5,
                      dense_lr: float = 1e-5) -> ModelBundle:
    if slots is None:
        slots = [str(s) for s in range(2000, 2040)]
    slots = tuple(sorted(set(slots)))        # reference sorts (multidnn.py:216-218)

    cols = [embedding_column(category_column(s, bucket_size), dim, combiner="mean")
            for s in slots]
    emb = EmbeddingFeatures(cols, SparseAdam(learning_rate=sparse_lr,
                                       **({} if opt_state_dtype is None
                                          else {"state_dtype": opt_state_dtype})),
                            num_shards=num_shards, group_tables=True,
                            # measured-best storage size: small
                            # prefetchable storages gather ~6x
                            # faster (probe25: 102.0 -> 94.6 ms/step at batch 32768)
                            max_group_bytes=10 << 20,
                            **({} if table_dtype is None else {"table_dtype": table_dtype}))

    return ModelBundle(
        name="multi_head",
        module=MultiHeadModule(slots=slots,
                               stacked_experts=stacked_experts),
        embedding=emb,
        losses={t: L.cross_entropy_per_sample for t in TASKS},
        metrics={t: [M.binary_accuracy(), M.auc(), M.copc()] for t in TASKS},
        dense_optimizer=optax.adam(dense_lr, b1=0.9, b2=0.999, eps=1e-8),
        compute_dtype=compute_dtype,
    )
