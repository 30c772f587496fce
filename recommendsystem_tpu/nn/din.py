"""DIN target attention — both reference variants, kept numerically distinct.

1. ``DINAttention``: general F-query variant of root ``din.py:6-47`` —
   scorer MLP [16 relu, 1 relu] over concat(q, k, q*k); masked positions are
   ZEROED (not -inf) and there is NO softmax (``din.py:39-44``); pooling is a
   plain matmul with the values.

2. ``DINPool``: staytime variant of ``staytime/layer.py:6-41`` — scorer MLP
   [16 sigmoid, 1 linear] over concat(q, f, q-f, q*f); masked positions get
   ``-2**32+1`` then softmax (``layer.py:32-35``); weighted sum over facts.
   On TPU the whole pool runs as one fused Pallas kernel
   (``kernels/din_pallas.py``).

SURVEY §7 "Mask numerics": the two masking conventions differ on purpose.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mlp import Dense

MASK_PAD = -(2.0 ** 32) + 1.0


def sequence_mask(lengths, maxlen: int):
    """tf.sequence_mask: (B,) int -> (B, maxlen) bool."""
    pos = jnp.arange(maxlen)[None, :]
    return pos < lengths[:, None]


class DINAttention(nn.Module):
    """General-query DIN (reference ``din.py``).

    queries: (B, H) or (B, F, H); keys/values: (B, T, H);
    mask: (B, T) bool or None.  Returns (B, H) when F==1 else (B, F, H).
    """

    hidden_units: tuple = (16, 1)

    @nn.compact
    def __call__(self, queries, keys, values, mask: Optional[jnp.ndarray] = None):
        squeeze_f = queries.ndim == 2
        if squeeze_f:
            queries = queries[:, None, :]          # (B, 1, H)
        f = queries.shape[1]
        t = keys.shape[1]

        q = jnp.broadcast_to(queries[:, :, None, :], (*queries.shape[:2], t, queries.shape[-1]))
        k = jnp.broadcast_to(keys[:, None, :, :], (keys.shape[0], f, t, keys.shape[-1]))
        deep = jnp.concatenate([q, k, q * k], axis=-1)  # (B, F, T, 3H)
        for i, unit in enumerate(self.hidden_units):
            deep = Dense(unit, activation="relu", name=f"din_nn_{i}")(deep)
        deep = jnp.squeeze(deep, axis=-1)               # (B, F, T)

        if mask is not None:
            m = jnp.broadcast_to(mask[:, None, :], deep.shape)
            deep = jnp.where(m, deep, jnp.zeros_like(deep))  # zeroed, NOT -inf

        out = jnp.einsum("bft,bth->bfh", deep, values,
                         preferred_element_type=jnp.float32)
        return jnp.squeeze(out, axis=1) if squeeze_f else out


class DINPool(nn.Module):
    """Single-query softmax DIN of ``staytime/layer.py:6-41``.

    query: (B, H); facts: (B, T, H); mask: (B, T) bool.  Returns (B, H).
    """

    hidden: int = 16

    @nn.compact
    def __call__(self, query, facts, mask: Optional[jnp.ndarray] = None):
        h = facts.shape[-1]
        glorot = nn.initializers.glorot_uniform()
        zeros = nn.initializers.zeros_init()
        w1 = self.param("w1", glorot, (4 * h, self.hidden))
        b1 = self.param("b1", zeros, (self.hidden,))
        w2 = self.param("w2", glorot, (self.hidden, 1))
        b2 = self.param("b2", zeros, (1,))

        from ..kernels.flags import use_pallas
        if mask is None:
            mask_f = jnp.ones(facts.shape[:2], jnp.float32)
        else:
            mask_f = mask.astype(jnp.float32)

        if use_pallas() and self.hidden == 16:
            from ..kernels.din_pallas import din_pool
            return din_pool(query, facts, mask_f, w1, b1, w2, b2)

        t = facts.shape[1]
        queries = jnp.broadcast_to(query[:, None, :], facts.shape)  # (B, T, H)
        din_all = jnp.concatenate([queries, facts, queries - facts,
                                   queries * facts], axis=-1)
        x = jax.nn.sigmoid(din_all @ w1 + b1)
        x = x @ w2 + b2
        scores = x.reshape(-1, 1, t)                                # (B, 1, T)
        scores = jnp.where(mask_f[:, None, :] > 0, scores,
                           jnp.full_like(scores, MASK_PAD))
        scores = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bot,bth->boh", scores, facts,
                         preferred_element_type=jnp.float32)
        return jnp.squeeze(out, axis=1)
