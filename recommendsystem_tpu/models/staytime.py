"""Staytime multi-task model — the richest reference workload
(``staytime/VideoDnn.py``, ``staytime/config.py``, ``staytime/model.py``).

Graph (``VideoDnn.py:27-215``): 32-d slot embeddings split into general
[0:16) and bias [16:) halves; DIN over 3 behaviour sequences keyed to the
video/author/L1-category query embeddings (``:52-78``); SENet (concat
squeeze) over the general halves (``:80-96``); user x item multiply
(``:98-105``); listwise FM cross (``:107-115``); FFM user x item pairs at
dim 8 (``:117-120``); concat everything (``:122-124``); 3 PPNet-gated
experts over (256, 128) (``:129-151``); 3-task MMoE gates (64, 32)
(``:153-164``); staytime head = DeepCross(3) + 400-way softmax ->
expected value via the bin centers, train output concat(dist, EV)
(``:167-179``); shortplay/longplay sigmoid heads fused with the FM logit
(``:181-191``).  Train vs predict outputs differ for staytime
(``:194-210``).  Losses: KL(2.0) + CE(2.0) + CE(1.0)
(``staytime/model.py:74-87``); sparse AdaGrad 5e-3 (``VideoDnn.py:233``),
dense Adam 5e-4 (``model.py:72``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from .. import nn as rnn
from ..embedding import (EmbeddingFeatures, SparseAdaGrad, category_column,
                         embedding_column)
from ..train import losses as L
from ..train import metrics as M
from .base import ModelBundle, register_model

MULTICLASS_NUM = 400
BIN_LIST = tuple(-19.0 + 0.5 * i for i in range(MULTICLASS_NUM))  # staytime/config.py:18-42

T_STAY = "video_id_rank_staytime_mtl_ppnet_v7_staytime"
T_SHORT = "video_id_rank_staytime_mtl_ppnet_v7_shortplay"
T_LONG = "video_id_rank_staytime_mtl_ppnet_v7_longplay"


@dataclasses.dataclass(frozen=True)
class StaytimeConfig:
    """Slot groups of ``staytime/config.py:4-16`` / ``VideoDnn.py:32-35``."""

    slots: Tuple[str, ...] = tuple(str(s) for s in (
        1568, 1570, 1571, 1574, 1575, 1576, 1577, 1578, 1579, 1581, 1582, 1583,
        1585, 1587, 1589, 1591, 1592, 1593, 1594, 1595, 1599, 1601,
        1611, 1612, 1614, 1616, 1623, 1636, 1736, 1737, 1738,
        1739, 1740, 1741, 1743, 1744, 1749, 2039, 2040, 2041, 2042, 2043, 2044,
        2050, 2051, 2052, 2123, 2125, 2127, 2128, 2130, 2131,
        2135, 2139, 2142, 2144, 2147, 2149, 2151, 2152,
        2154, 2156, 2544,
        2597, 3051, 3365, 3369, 3376, 3370,
        1745, 2045, 1632, 1735, 2153, 2047, 2244, 2046, 2150, 2247, 1625, 1624,
        2148, 2159, 2146, 2242, 2260, 2155, 2259, 2615, 4500, 4386))
    seq_slots: Tuple[str, ...] = ("2125", "2128", "2130")
    user_slots: Tuple[str, ...] = ("1568", "1589", "2039", "1570")
    item_slots: Tuple[str, ...] = ("1591", "1593", "1737", "1614")
    bias_slots: Tuple[str, ...] = ("3051", "1570", "2039", "2544", "1568", "3376",
                                   "3365", "3369", "2597", "1737", "1593", "1591",
                                   "1589", "1614")
    # seq slot -> query slot (VideoDnn.py:69-76)
    seq_query: Tuple[Tuple[str, str], ...] = (("2125", "1591"), ("2128", "1593"),
                                              ("2130", "1737"))
    seq_max_len: int = 50
    num_experts: int = 3
    num_tasks: int = 3
    dim: int = 32
    bucket_size: int = 81920


class StaytimeModule(nn.Module):
    cfg: StaytimeConfig
    deep_hidden_units: Tuple[int, ...] = (256, 128)
    stacked_experts: bool = False

    @nn.compact
    def __call__(self, embs: Dict, training: bool = False):
        c = self.cfg
        general = {s: embs[s][:, 0:16] for s in c.slots}
        general_inputs = [general[s] for s in c.slots]
        bias_inputs = [embs[s][:, 16:] for s in c.bias_slots]

        # DIN over behaviour sequences
        seq_query = dict(c.seq_query)
        din_embs = []
        for s in c.seq_slots:
            seq_emb, seq_mask = embs[f"seq_{s}"]
            query = general[seq_query[s]]
            din = rnn.DINPool(name=f"din_{s}")(query, seq_emb[:, :, 0:16], seq_mask)
            din_embs.append(din)

        # SENet (concat squeeze) reweight of the general halves
        general_reweight = rnn.SENet(squeeze="concat", name="senet")(general_inputs)

        # user x item multiply
        mu = jnp.concatenate([general[s] for s in c.user_slots], axis=-1)
        mi = jnp.concatenate([general[s] for s in c.item_slots], axis=-1)
        multiply_result = jax.nn.relu(mu * mi)

        # listwise FM over the reweighted general embeddings
        cross_term, fm_logit = rnn.fm_cross_term(general_reweight)

        # FFM user x item at dim 8
        ffm = rnn.FFMBlock(ffm_slots=((c.user_slots, c.item_slots, 8),),
                           name="ffm")(general)

        concated = jnp.concatenate(
            general_reweight + [cross_term, multiply_result, ffm] + din_embs, axis=-1)
        gate_input = jnp.concatenate(bias_inputs, axis=-1)

        # PPNet-gated experts (VideoDnn.py:129-151)
        if self.stacked_experts:
            experts = rnn.stacked_gated_experts(
                c.num_experts, self.deep_hidden_units, concated, gate_input)
        else:
            expert_outs = []
            for i in range(c.num_experts):
                deep = concated
                for j, unit in enumerate(self.deep_hidden_units):
                    gate = rnn.Dense(unit, activation="relu",
                                     name=f"gate_{i}_{j}_1")(gate_input)
                    gate = rnn.Dense(unit, activation="sigmoid",
                                     name=f"gate_{i}_{j}_2")(gate) * 2
                    deep = rnn.Dense(unit, activation="relu",
                                     name=f"expert_output_{i}_{j}")(deep)
                    deep = gate * deep
                expert_outs.append(deep)
            experts = jnp.stack(expert_outs, axis=1)        # (B, E, D)

        # MMoE gates (VideoDnn.py:153-164)
        mmoe_outs = []
        for i in range(c.num_tasks):
            g = concated
            for j, unit in enumerate((64, 32)):
                g = rnn.Dense(unit, activation="relu", name=f"gate_{i}_{j}")(g)
            g = rnn.Dense(c.num_experts, activation="softmax",
                          name=f"gate_output_{i}")(g)
            mmoe_outs.append(jnp.einsum("bed,be->bd", experts, g,
                                        preferred_element_type=jnp.float32))

        # staytime 400-bin distribution head + EV (VideoDnn.py:167-179)
        cross_feature = rnn.DeepCrossLayer(num_layer=3, name="dcn")(concated)
        mmoe_ext = jnp.concatenate([mmoe_outs[0], cross_feature], axis=-1)
        st_logits = rnn.Dense(MULTICLASS_NUM, activation=None,
                              name="staytime_output")(mmoe_ext)
        st_dist = jax.nn.softmax(st_logits)
        wt_bins = jnp.asarray(BIN_LIST, jnp.float32).reshape(MULTICLASS_NUM, 1)
        st_pred = jnp.dot(st_dist, wt_bins, preferred_element_type=jnp.float32)
        st_pred = jnp.where(st_pred < 0.0, 0.0, st_pred)
        st_train = jnp.concatenate([st_dist, st_pred], axis=-1)

        # shortplay / longplay fused with the FM logit (VideoDnn.py:181-191)
        sp_deep = rnn.Dense(1, activation="relu", name="tower_deep_shortplay")(mmoe_outs[1])
        sp = rnn.Dense(1, activation="sigmoid", name="shortplay_pred")(
            jnp.concatenate([fm_logit, sp_deep], axis=1))
        lp_deep = rnn.Dense(1, activation="relu", name="tower_deep_longplay")(mmoe_outs[2])
        lp = rnn.Dense(1, activation="sigmoid", name="longplay_pred")(
            jnp.concatenate([fm_logit, lp_deep], axis=1))

        return {
            T_STAY: st_train,              # train head: (B, 401)
            T_SHORT: sp,
            T_LONG: lp,
            f"{T_STAY}_pred": st_pred,     # online EV head: (B, 1)
        }


@register_model("staytime")
def create_staytime(cfg: Optional[StaytimeConfig] = None,
                    deep_hidden_units: Tuple[int, ...] = (256, 128),
                    stacked_experts: bool = False,
                    num_shards: int = 1,
                    table_dtype=None,
                    compute_dtype=None,
                    sparse_lr: float = 5e-3,
                    dense_lr: float = 5e-4) -> ModelBundle:
    cfg = cfg or StaytimeConfig()

    cols = []
    for s in cfg.slots:
        cat = category_column(s, cfg.bucket_size)
        cols.append(embedding_column(cat, cfg.dim, combiner="mean"))
        if s in cfg.seq_slots:
            cols.append(embedding_column(cat, cfg.dim, combiner=None,
                                         seq_max_len=cfg.seq_max_len,
                                         name=f"seq_{s}"))
    emb = EmbeddingFeatures(cols, SparseAdaGrad(learning_rate=sparse_lr,
                                                initial_g2sum=0.1,
                                                initial_scale=0.1),
                            num_shards=num_shards, group_tables=True,
                            # measured-best storage size (probe25d sweep at
                            # batch 16384, realistic VarLen): table pairs
                            # (~21 MB) are prefetchable AND keep the
                            # storage count moderate — 1 table/storage
                            # 193.4, 2/st 149.3, 3/st 165.3, 5/st 171.1
                            # ms/step
                            max_group_bytes=30 << 20,
                            **({} if table_dtype is None else {"table_dtype": table_dtype}))

    return ModelBundle(
        name="staytime",
        module=StaytimeModule(cfg=cfg,
                              deep_hidden_units=tuple(deep_hidden_units),
                              stacked_experts=stacked_experts),
        embedding=emb,
        losses={T_STAY: L.kl_loss,
                T_SHORT: L.cross_entropy_elementwise,
                T_LONG: L.cross_entropy_elementwise},
        loss_weights={T_STAY: 2.0, T_SHORT: 2.0, T_LONG: 1.0},
        metrics={T_STAY: [M.bin_accuracy(BIN_LIST), M.ev_mae(), M.ev_mse()],
                 T_SHORT: [M.binary_accuracy(), M.auc()],
                 T_LONG: [M.binary_accuracy(), M.auc()]},
        dense_optimizer=optax.adam(dense_lr, b1=0.9, b2=0.999, eps=1e-8),
        predict_outputs={T_STAY: f"{T_STAY}_pred", T_SHORT: T_SHORT, T_LONG: T_LONG},
        config=cfg,
        compute_dtype=compute_dtype,
    )
