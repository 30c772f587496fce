"""CTR production model: SENet + AutoInt + PPNet + MMoE + CAN
(``rank/ctr/model_init.py`` on the feature machinery of
``rank/ctr/base_model.py``).

Graph (``model_init.py:19-162``): SENet (mean squeeze, reduction 4) reweights
the per-feature interval slices; each reweighted slice maps through a linear
Dense(8) into the (B, F, 8) AutoInt stack; PPNet gate bank
2*sigmoid(Dense(704)) split [256,64,8,256,64,8,32,16]; gated deep tower
(32, 16) with L1L2(1e-5); user x item multiply from the bias groups; CAN
micro-net weights generated from the can-bias embeddings (Dense(8*6+6+6*4+4));
MMoE: 3 experts (512, 256) with per-layer gates over the gate-feature concat,
2 task gates (256, 32) -> softmax(3); per-task output MLP (64, 8) with PPNet
gates and the CAN micro-net applied at the last layer; sigmoid + clip(1e-6, 1).
Tasks: ``video_id_rank_hp_ctr_addfeasetwo_click`` / ``_effect_click``.
Optimizers: sparse+dense Adam 5e-5 (``base_model.py:163,192``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from .. import nn as rnn
from ..core.config import ModelConfig, synthetic_ctr_config
from ..embedding import EmbeddingFeatures, SparseAdam, category_column, embedding_column
from ..train import losses as L
from ..train import metrics as M
from .base import ModelBundle, register_model
from .plumbing import slice_wide_rows

T_CLICK = "video_id_rank_hp_ctr_addfeasetwo_click"
T_EFFECT = "video_id_rank_hp_ctr_addfeasetwo_effect_click"
REG = (1e-5, 1e-5)
PPNET_SPLITS = (256, 64, 8, 256, 64, 8, 32, 16)

# the production gate-feature slot list (``rank/ctr/base_model.py:135``; the
# duplicate '1578' is the reference's — membership test only, so harmless)
REFERENCE_GATE_SLOTS = ('1568', '1570', '1578', '1591', '1593', '1614',
                        '1736', '1737', '2039', '2599', '3051', '3303',
                        '3389', '1576', '1577', '1578')


class CTRModule(nn.Module):
    cfg: ModelConfig
    gate_slots: Tuple[str, ...]
    deep_hidden_units: Tuple[int, ...] = (32, 16)
    mmoe_expert_hidden: Tuple[int, ...] = (512, 256)
    mmoe_gate_hidden: Tuple[int, ...] = (256, 32)
    output_dnn_hidden: Tuple[int, ...] = (64, 8)
    num_experts: int = 3
    num_tasks: int = 2
    stacked_experts: bool = False
    # reference AutoInt dropout 0.2 (``model_init.py:54-60``); 0.0 gives the
    # deterministic graph the TF training-parity twin tracks step-for-step
    attention_dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, embs: Dict[str, jnp.ndarray], training: bool = False):
        structure, bias, gate_list = slice_wide_rows(self.cfg, embs, self.gate_slots)

        # SENet over per-feature slices (mean squeeze, model_init.py:22-41)
        reweight = rnn.SENet(squeeze="mean", reduction=4, name="senet")(structure)

        # per-field linear 8-d map -> AutoInt stack (model_init.py:44-60)
        emb_3d = [rnn.Dense(8, activation=None, name=f"emb_linear_map_{i}")(e)[:, None, :]
                  for i, e in enumerate(reweight)]
        autoint_inputs = jnp.concatenate(emb_3d, axis=1)
        autoint_out = rnn.InteractingLayer(
            layer_num=1, unit_num=8, head_num=2,
            use_dropout=self.attention_dropout_rate > 0,
            dropout_rate=self.attention_dropout_rate,
            use_res=True, name="interacting")(autoint_inputs, training=training)
        autoint_out = autoint_out.reshape(autoint_out.shape[0], -1)

        # PPNet gate bank (model_init.py:63-68)
        ppnet_inputs = jnp.concatenate(bias["ppnet"], axis=1)
        ppnet_gates = rnn.PPNetGateBank(splits=PPNET_SPLITS, name="ppnet")(ppnet_inputs)

        # gated deep tower (model_init.py:70-78)
        deep = jnp.concatenate(reweight, axis=1)
        for i, unit in enumerate(self.deep_hidden_units):
            deep = rnn.Dense(unit, activation=None, name=f"dnn_{i}",
                             kernel_regularizer=REG)(deep)
            deep = jax.nn.relu(deep * ppnet_gates[i + 6])

        # user x item multiply (model_init.py:80-85)
        mu = jnp.concatenate(bias["multiply_user"], axis=1)
        mi = jnp.concatenate(bias["multiply_item"], axis=1)
        multiply_result = jax.nn.relu(mu * mi)

        result = jnp.concatenate([deep, autoint_out, multiply_result], axis=1)

        # CAN micro-net weights from the can-bias embeddings (model_init.py:91-99)
        can_inputs = jnp.concatenate(bias["can"], axis=1)
        can_raw = rnn.Dense(8 * 6 + 6 + 6 * 4 + 4, activation=None,
                            name="dnn_can")(can_inputs)
        w1 = can_raw[:, 0:48].reshape(-1, 8, 6)
        b1 = can_raw[:, 48:54].reshape(-1, 1, 6)
        w2 = can_raw[:, 54:78].reshape(-1, 6, 4)
        b2 = can_raw[:, 78:82].reshape(-1, 1, 4)

        # MMoE experts with per-layer gates over gate features (model_init.py:101-118)
        gate_input = jnp.concatenate(gate_list, axis=1)
        if self.stacked_experts:
            experts = rnn.stacked_gated_experts(
                self.num_experts, self.mmoe_expert_hidden, result, gate_input)
        else:
            expert_outs = []
            for i in range(self.num_experts):
                expert = result
                for j, unit in enumerate(self.mmoe_expert_hidden):
                    g = rnn.Dense(unit, activation="relu", name=f"gate_{i}_{j}_1")(gate_input)
                    g = 2 * rnn.Dense(unit, activation="sigmoid", name=f"gate_{i}_{j}_2")(g)
                    expert = rnn.Dense(unit, activation="relu",
                                       name=f"expert_output_{i}_{j}")(expert)
                    expert = g * expert
                expert_outs.append(expert)
            experts = jnp.stack(expert_outs, axis=1)     # (B, E, 256)

        # per-task expert pooling (model_init.py:120-132)
        mmoe_outs = []
        for i in range(self.num_tasks):
            g = result
            for j, unit in enumerate(self.mmoe_gate_hidden):
                g = rnn.Dense(unit, activation="relu", name=f"gate_{i}_{j}")(g)
            g = rnn.Dense(self.num_experts, activation="softmax",
                          name=f"gate_output_{i}")(g)
            mmoe_outs.append(jnp.einsum("bed,be->bd", experts, g,
                                        preferred_element_type=jnp.float32))

        # per-task output MLP with PPNet gates + CAN tail (model_init.py:134-161)
        outputs = {}
        for i, task in enumerate((T_CLICK, T_EFFECT)):
            r = mmoe_outs[i]
            n_out = len(self.output_dnn_hidden)
            for j, unit in enumerate(self.output_dnn_hidden):
                if j == 0:
                    r = jax.nn.relu(r * ppnet_gates[i * 3])
                r = rnn.Dense(unit, activation=None, name=f"task{i}_dnn2_{j}",
                              kernel_regularizer=REG)(r)
                r = jax.nn.relu(r * ppnet_gates[i * 3 + j + 1])
                if j == n_out - 1:
                    re = r[:, None, :]                       # (B, 1, 8)
                    can = jax.nn.relu(jnp.matmul(re, w1) + b1)
                    can = jax.nn.relu(jnp.matmul(can, w2) + b2)
                    can = jnp.squeeze(can, axis=1)           # (B, 4)
                    r = jnp.concatenate([r, can], axis=1)
            out = rnn.Dense(1, activation="sigmoid", name=f"task{i}_out")(r)
            outputs[task] = jnp.clip(out, 1e-6, 1.0)
        return outputs


@register_model("ctr")
def create_ctr(cfg: Optional[ModelConfig] = None,
               gate_slots: Optional[Tuple[str, ...]] = None,
               bucket_size: int = 265000,
               num_shards: int = 1,
               table_dtype=None,
               compute_dtype=None,
               opt_state_dtype=None,
               stacked_experts: bool = False,
               attention_dropout_rate: float = 0.2,
               sparse_lr: float = 5e-5,
               dense_lr: float = 5e-5) -> ModelBundle:
    if cfg is None:
        cfg = synthetic_ctr_config(num_slots=24, num_bias=8)
    if gate_slots is None:
        # reference hardcodes a gate slot list (base_model.py:135); default to
        # a prefix of the config's slots
        gate_slots = tuple(cfg.sparse_slots[:8])

    dim = cfg.max_embed_size
    # table binding goes through the config's feature_id remap: slots mapped
    # to the same table share one embedding space (base_model.py:89-107)
    cols = [embedding_column(category_column(cfg.table_slot(slot), bucket_size),
                             dim, combiner="mean", name=slot)
            for slot in cfg.sparse_slots]
    emb = EmbeddingFeatures(cols, SparseAdam(learning_rate=sparse_lr,
                                       **({} if opt_state_dtype is None
                                          else {"state_dtype": opt_state_dtype})),
                            num_shards=num_shards, group_tables=True,
                            **({} if table_dtype is None else {"table_dtype": table_dtype}))

    metrics = [M.binary_accuracy(), M.auc(), M.copc()]
    return ModelBundle(
        name="ctr",
        module=CTRModule(cfg=cfg, gate_slots=tuple(gate_slots),
                         stacked_experts=stacked_experts,
                         attention_dropout_rate=attention_dropout_rate),
        embedding=emb,
        losses={T_CLICK: L.cross_entropy_sum_mean, T_EFFECT: L.cross_entropy_sum_mean},
        metrics={T_CLICK: list(metrics), T_EFFECT: list(metrics)},
        dense_optimizer=optax.adam(dense_lr, b1=0.9, b2=0.999, eps=1e-8),
        config=cfg,
        compute_dtype=compute_dtype,
    )


def production_ctr(model_parameter_path: str, **kwargs) -> ModelBundle:
    """Build the flagship ranker straight from a real ``model_parameter.json``
    (the reference's 212-feature / 176-slot production config,
    ``rank/ctr/model_parameter.json``), with the production gate-slot list
    (``base_model.py:135``) and any ``featureid_to_slot`` remap in the file."""
    from ..core.config import load_model_parameter_json
    cfg = load_model_parameter_json(model_parameter_path)
    kwargs.setdefault("gate_slots", REFERENCE_GATE_SLOTS)
    return create_ctr(cfg=cfg, **kwargs)
