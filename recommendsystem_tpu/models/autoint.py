"""AutoInt CTR model (reference top-level ``autoint`` file).

Graph (``autoint:18-56``): per-feature embeddings stacked to (B, F, D) ->
InteractingLayer branch (flattened) + deep MLP branch over the flat concat ->
concat -> logits MLP -> clip(1e-6, 1.0).  Config knobs mirror
``model_config['model_param']['interact'|'mlp'|'logits']`` (``autoint:30-35``,
consumed from model_parameter.json).  Output name kept:
``video_id_rank_skip_model`` (``autoint:54``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import optax

from .. import nn as rnn
from ..core.config import ModelConfig, synthetic_ctr_config
from ..embedding import EmbeddingFeatures, SparseAdam, category_column, embedding_column
from ..train import losses as L
from ..train import metrics as M
from .base import ModelBundle, register_model
from .plumbing import slice_wide_rows

TASK = "video_id_rank_skip_model"

DEFAULT_MODEL_PARAM = {
    "interact": {"layer_num": 1, "unit_num": 8, "head_num": 2,
                 "use_dropout": True, "dropout_rate": 0.2, "use_res": True},
    "mlp": {"hidden_units": (32, 16), "activation": "relu"},
    "logits": {"hidden_units": (1,), "activation": "sigmoid"},
}


class AutoIntModule(nn.Module):
    cfg: ModelConfig
    model_param: Any

    @nn.compact
    def __call__(self, embs: Dict[str, jnp.ndarray], training: bool = False):
        structure, _, _ = slice_wide_rows(self.cfg, embs)
        widths = {e.shape[-1] for e in structure}
        if len(widths) != 1:
            raise ValueError(
                f"autoint needs uniform feature emb sizes, got {sorted(widths)}")
        all_inputs = jnp.concatenate([e[:, None, :] for e in structure], axis=1)

        p = self.model_param["interact"]
        autoint_out = rnn.InteractingLayer(
            layer_num=p["layer_num"], unit_num=p["unit_num"], head_num=p["head_num"],
            use_dropout=p["use_dropout"], dropout_rate=p["dropout_rate"],
            use_res=p["use_res"], name="interacting")(all_inputs, training=training)
        autoint_out = autoint_out.reshape(autoint_out.shape[0], -1)

        deep = all_inputs.reshape(all_inputs.shape[0], -1)
        deep = rnn.MultiLayerDense(units=tuple(self.model_param["mlp"]["hidden_units"]),
                                   activation=self.model_param["mlp"]["activation"],
                                   name="mlp")(deep)

        result = jnp.concatenate([deep, autoint_out], axis=1)
        output = rnn.MultiLayerDense(units=tuple(self.model_param["logits"]["hidden_units"]),
                                     activation=self.model_param["logits"]["activation"],
                                     name="logits")(result)
        output = jnp.clip(output, 1e-6, 1.0)
        return {TASK: output}


@register_model("autoint")
def create_autoint(cfg: Optional[ModelConfig] = None,
                   model_param: Optional[dict] = None,
                   bucket_size: int = 265000,
                   num_shards: int = 1,
                   table_dtype=None,
                   compute_dtype=None,
                   opt_state_dtype=None,
                   sparse_lr: float = 5e-5,
                   dense_lr: float = 5e-5) -> ModelBundle:
    """LRs per the reference: sparse/dense Adam 5e-5 (``base_model.py:163,192``)."""
    if cfg is None:
        cfg = synthetic_ctr_config(num_slots=24, emb_sizes=(8,), num_bias=0)
    model_param = {**DEFAULT_MODEL_PARAM, **(model_param or {})}

    dim = cfg.max_embed_size
    cols = [embedding_column(category_column(cfg.table_slot(slot), bucket_size),
                             dim, combiner="mean", name=slot)
            for slot in cfg.sparse_slots]
    emb = EmbeddingFeatures(cols, SparseAdam(learning_rate=sparse_lr,
                                       **({} if opt_state_dtype is None
                                          else {"state_dtype": opt_state_dtype})),
                            num_shards=num_shards, group_tables=True,
                            # ~10 MB storages let XLA prefetch EVERY gather
                            # target into scratch (S(1)) — the round-5 trace
                            # showed prefetched storages gathering at ~1.8
                            # ns/id vs ~12 for HBM-direct; measured sweep
                            # (scripts/probe25.py): 40 MB 134.7 ms/step,
                            # 10 MB 110.9 at headline shapes.  (Model-
                            # dependent: staytime measured best at 40 MB —
                            # storage count outweighs prefetch there.)
                            max_group_bytes=10 << 20,
                            **({} if table_dtype is None else {"table_dtype": table_dtype}))

    return ModelBundle(
        name="autoint",
        module=AutoIntModule(cfg=cfg, model_param=model_param),
        embedding=emb,
        losses={TASK: L.cross_entropy_sum_mean},
        metrics={TASK: [M.binary_accuracy(), M.auc(), M.copc()]},
        dense_optimizer=optax.adam(dense_lr, b1=0.9, b2=0.999, eps=1e-8),
        config=cfg,
        compute_dtype=compute_dtype,
    )
