"""Rough-rank (pre-rank) DSSM with PLE towers + teacher distillation
(``rough_rank/model.py``).

Graph: user tower = PLE(2 tasks, 4 shared + 4 specific experts of Dense(32))
-> DNN(16, linear) per task, selected per-sample by the dense flag slot
``4575`` via where (``model.py:37-54``); item tower = PLE(1 task) -> DNN(16)
(``:56-60``); teacher = CrossNet(2) + Dense(128,64) over ALL embeddings ->
Dense(16) -> Dense(1) logit (``:16-34``); student = shallow tower
Dense(32, relu) -> logit over [user_emb ‖ item_emb] (``:70-86``); KD =
per-sample MSE(student_logit, stop_grad(teacher_logit)) (``:166-167``).
Losses: BCE(student) + BCE(teacher) + mean(kd) (``:210-214``).
Optimizers: sparse Adam 1e-3 (``:106``), dense Adam 1e-4 (``:209``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from .. import nn as rnn
from ..embedding import EmbeddingFeatures, SparseAdam, category_column, embedding_column
from ..train import losses as L
from ..train import metrics as M
from .base import ModelBundle, register_model

FLAG_SLOT = "4575"


class _Tower(nn.Module):
    """PLE tower -> per-task DNN(16); 2-task version switched by mask.

    ``stacked_experts`` swaps in the vmapped PLEStacked (same math, expert
    params stacked on a leading axis shardable over the model mesh axis —
    expert parallelism)."""

    num_tasks: int
    output_dim: int = 16
    task_names: Tuple[str, ...] = ("td", "hpld")
    stacked_experts: bool = False

    @nn.compact
    def __call__(self, weight_concat, mask_tensor=None, training: bool = False):
        ple_cls = rnn.PLEStacked if self.stacked_experts else rnn.PLE
        ple_outputs = ple_cls(num_tasks=self.num_tasks, num_shared_experts=4,
                              num_specific_experts=4, expert_dnn_units=(32,),
                              gate_dnn_units=(), name="ple")(
                                  weight_concat, training=training)
        if mask_tensor is not None:
            outs = [rnn.DNN((self.output_dim,), output_activation="linear",
                            name=f"{t}_emb")(ple_outputs[i], training=training)
                    for i, t in enumerate(self.task_names)]
            sel = (mask_tensor == 1).reshape(-1, 1)
            return jnp.where(sel, outs[1], outs[0])
        return rnn.DNN((self.output_dim,), output_activation="linear",
                       name="emb")(ple_outputs[0], training=training)


class DSSMModule(nn.Module):
    user_slots: Tuple[str, ...]
    item_slots: Tuple[str, ...]
    user_output_dim: int = 16
    item_output_dim: int = 16
    stacked_experts: bool = False

    @nn.compact
    def __call__(self, embs: Dict[str, jnp.ndarray], training: bool = False,
                 dense_inputs: Optional[Dict[str, jnp.ndarray]] = None):
        flag = None
        if dense_inputs is not None and FLAG_SLOT in dense_inputs:
            flag = dense_inputs[FLAG_SLOT]

        user_concat = jnp.concatenate(
            [embs[s] for s in sorted(self.user_slots)], axis=-1)
        item_concat = jnp.concatenate(
            [embs[s] for s in sorted(self.item_slots)], axis=-1)
        all_concat = jnp.concatenate(
            [embs[s] for s in sorted(set(self.user_slots) | set(self.item_slots))],
            axis=-1)

        user_emb = _Tower(num_tasks=2, output_dim=self.user_output_dim,
                          stacked_experts=self.stacked_experts,
                          name="sub_model_user")(user_concat, mask_tensor=flag,
                                                 training=training)
        item_emb = _Tower(num_tasks=1, output_dim=self.item_output_dim,
                          stacked_experts=self.stacked_experts,
                          name="sub_model_item")(item_concat, training=training)

        # teacher (model.py:16-34)
        cross = rnn.CrossNet(layer_num=2, name="teacher_cross")(all_concat)
        deep = rnn.Dense(128, activation="relu", name="teacher_d128")(all_concat)
        deep = rnn.Dense(64, activation="relu", name="teacher_d64")(deep)
        merge = jnp.concatenate([deep, cross], axis=-1)
        t16 = rnn.Dense(16, activation=None, name="teacher_d16")(merge)
        teacher_logit = rnn.Dense(1, activation=None, name="pred_teacher")(t16)
        teacher_output = jax.nn.sigmoid(teacher_logit)

        # student shallow tower (model.py:70-86)
        sdeep = jnp.concatenate([user_emb, item_emb], axis=-1)
        sdeep = rnn.Dense(32, activation="relu", name="shallow_dnn_0")(sdeep)
        student_logit = rnn.Dense(1, activation=None, name="logit_shallow")(sdeep)
        student_output = jax.nn.sigmoid(student_logit)

        kd = rnn.kd_loss(student_logit, jax.lax.stop_gradient(teacher_logit))

        return {
            "student": student_output,
            "teacher": teacher_output,
            "distill": kd[:, None],
            "user_emb": user_emb,
            "item_emb": item_emb,
        }


@register_model("rough_rank")
def create_rough_rank(user_slots: Optional[Sequence[str]] = None,
                      item_slots: Optional[Sequence[str]] = None,
                      bucket_size: int = 25600,
                      dim: int = 16,
                      num_shards: int = 1,
                      table_dtype=None,
                      compute_dtype=None,
                      opt_state_dtype=None,
                      stacked_experts: bool = False,
                      sparse_lr: float = 1e-3,
                      dense_lr: float = 1e-4) -> ModelBundle:
    if user_slots is None:
        user_slots = [str(s) for s in range(1560, 1590)]
    if item_slots is None:
        item_slots = [str(s) for s in range(1591, 1610)]

    all_slots = sorted(set(user_slots) | set(item_slots))
    cols = [embedding_column(category_column(s, bucket_size), dim, combiner="mean")
            for s in all_slots]
    emb = EmbeddingFeatures(cols, SparseAdam(learning_rate=sparse_lr,
                                       **({} if opt_state_dtype is None
                                          else {"state_dtype": opt_state_dtype})),
                            num_shards=num_shards, group_tables=True,
                            # measured-best storage size: small
                            # prefetchable storages gather ~6x
                            # faster (probe25: 124.5 -> 107.6 ms/step at batch 32768)
                            max_group_bytes=4 << 20,
                            **({} if table_dtype is None else {"table_dtype": table_dtype}))

    return ModelBundle(
        name="rough_rank",
        module=DSSMModule(user_slots=tuple(user_slots),
                          item_slots=tuple(item_slots),
                          stacked_experts=stacked_experts),
        embedding=emb,
        losses={"student": L.binary_cross_entropy,
                "teacher": L.binary_cross_entropy,
                "distill": L.y_pred_loss},
        metrics={"student": [M.binary_accuracy(), M.auc(), M.ctr(), M.copc()],
                 "teacher": [M.binary_accuracy(), M.auc(), M.ctr(), M.copc()]},
        dense_optimizer=optax.adam(dense_lr, b1=0.9, b2=0.999, eps=1e-8),
        dense_input_keys=(FLAG_SLOT,),
        predict_outputs={"student": "student", "teacher": "teacher",
                         "user_emb": "user_emb", "item_emb": "item_emb"},
        compute_dtype=compute_dtype,
    )
