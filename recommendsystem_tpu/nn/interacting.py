"""AutoInt interacting layer (multi-head self-attention over fields).

Re-design of reference ``InteractingLayer.py:7-61`` (byte-identical copy at
``rank/multi_head/interacting_layer.py``).  Faithful semantics:

- ONE set of Q/K/V/res Dense layers (relu-activated) shared across all
  ``layer_num`` stacked iterations (created once in ``__init__``,
  ``InteractingLayer.py:24-30``);
- head split via ``tf.split(axis=2)+concat(axis=0)`` == head-major fold into
  the batch dim (``:47-49``);
- scale by ``sqrt(d_head)`` (``:51``), softmax over keys, optional dropout on
  the attention weights (``:53-54``), residual + ReLU + LayerNorm (``:57-60``).

The TPU implementation keeps the whole (B, F, D) block resident and uses a
batched einsum that XLA maps onto the MXU; an optional fused Pallas kernel
lives in ``kernels/interacting_pallas.py``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mlp import Dense


class InteractingLayer(nn.Module):
    layer_num: int = 1
    unit_num: int = 128
    head_num: int = 1
    use_dropout: bool = False
    dropout_rate: float = 0.3
    use_res: bool = True
    ln_epsilon: float = 1e-3   # Keras LayerNormalization default

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        if inputs.ndim != 3:
            raise ValueError(
                "The rank of input of InteractingLayer must be 3, but now is %d" % inputs.ndim)
        if self.unit_num % self.head_num != 0:
            raise ValueError("unit_num must divide head_num")
        d_head = self.unit_num // self.head_num

        query_dense = Dense(self.unit_num, activation="relu", name="query_dense")
        key_dense = Dense(self.unit_num, activation="relu", name="key_dense")
        value_dense = Dense(self.unit_num, activation="relu", name="value_dense")
        res_dense = Dense(self.unit_num, activation="relu", name="res_dense") if self.use_res else None
        layer_norm = nn.LayerNorm(epsilon=self.ln_epsilon, name="layer_norm")
        dropout = nn.Dropout(self.dropout_rate, deterministic=not training,
                             name="weight_dropout") if self.use_dropout else None

        output = inputs
        for _ in range(self.layer_num):
            b, f, _ = output.shape
            query = query_dense(output)   # (B, F, U)
            key = key_dense(output)
            value = value_dense(output)
            res = res_dense(output) if self.use_res else None

            # (B, F, U) -> (B, H, F, dh); head-major batch fold is equivalent
            # to tf.split(axis=2)+concat(axis=0) up to batch ordering, which
            # the attention never mixes.
            def split_heads(t):
                return t.reshape(b, f, self.head_num, d_head).transpose(0, 2, 1, 3)

            q, k, v = split_heads(query), split_heads(key), split_heads(value)
            weight = jnp.einsum("bhfd,bhgd->bhfg", q, k,
                                preferred_element_type=jnp.float32)
            weight = weight / (d_head ** 0.5)
            weight = jax.nn.softmax(weight, axis=-1)
            if dropout is not None:
                weight = dropout(weight)
            out = jnp.einsum("bhfg,bhgd->bhfd", weight, v,
                             preferred_element_type=jnp.float32)
            output = out.transpose(0, 2, 1, 3).reshape(b, f, self.unit_num)
            if self.use_res:
                output = output + res
            output = jax.nn.relu(output)
            output = layer_norm(output)
        return output
