"""Similarity + distillation loss layers (``rough_rank/layer.py:6-30,272-279``)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class Similarity(nn.Module):
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, inputs):
        user_emb, item_emb = inputs
        out = jnp.sum(user_emb * item_emb, axis=-1, keepdims=True)
        if self.use_sigmoid:
            out = jax.nn.sigmoid(out)
        return out


def kd_loss(student_predictions, teacher_predictions):
    """Per-sample MSE distillation (Reduction.NONE, ``layer.py:272-279``)."""
    return jnp.mean(jnp.square(teacher_predictions - student_predictions), axis=-1)
