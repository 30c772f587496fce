"""Factorization-machine family: FM (2-D and 3-D), listwise FM, FFM block.

- ``FMLayer3D``: ``staytime/layer.py:83-116`` — (B, F, D) -> (B, 1) pairwise
  interaction sum without linear term.
- ``fm_cross_term`` / ``fm_logit``: the inline listwise FM of
  ``staytime/VideoDnn.py:107-115`` over a list of (B, D) field embeddings;
  returns both the (B, D) cross_term vector and the (B, 1) logit.
- ``DeepFMLayer``: ``rank/finish/videodnn.py:23-52`` — 2-D FM over a flat
  concat with a GlorotNormal factor matrix (in, 8) plus a Dense(1) linear
  term; output (B, 1).
- ``ffm_block``: ``staytime/VideoDnn.py:11-25`` — per-(x, y) field pair,
  project both to ``dim`` with independent Dense layers and multiply.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .mlp import Dense


class FMLayer3D(nn.Module):
    @nn.compact
    def __call__(self, inputs):
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % inputs.ndim)
        square_of_sum = jnp.square(jnp.sum(inputs, axis=1, keepdims=True))
        sum_of_square = jnp.sum(inputs * inputs, axis=1, keepdims=True)
        cross_term = square_of_sum - sum_of_square         # (B, 1, D)
        return 0.5 * jnp.sum(cross_term, axis=-1)          # (B, 1)


def fm_cross_term(field_embs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Listwise FM over equal-width field embeddings (VideoDnn.py:107-115)."""
    stacked = jnp.stack(field_embs, axis=0)                # (F, B, D)
    sum_embs = jnp.sum(stacked, axis=0)
    sum_square = sum_embs * sum_embs
    square_sum = jnp.sum(stacked * stacked, axis=0)
    cross = sum_square - square_sum                        # (B, D)
    logit = 0.5 * jnp.sum(cross, axis=-1, keepdims=True)   # (B, 1)
    return cross, logit


class DeepFMLayer(nn.Module):
    """finish-model FM: order-2 factor term + linear term (videodnn.py:23-52)."""

    factor_dim: int = 8

    @nn.compact
    def __call__(self, inputs):
        fm_matrix = self.param("weight", nn.initializers.glorot_normal(),
                               (inputs.shape[-1], self.factor_dim))
        sum_square_by_row = jnp.square(
            jnp.dot(inputs, fm_matrix, preferred_element_type=jnp.float32))
        square_sum_by_row = jnp.dot(
            jnp.square(inputs), jnp.square(fm_matrix),
            preferred_element_type=jnp.float32)
        high_order = 0.5 * jnp.sum(sum_square_by_row - square_sum_by_row,
                                   axis=1, keepdims=True)
        linear = Dense(1, activation=None, name="deeepfmlinear")(inputs)
        return high_order + linear


class FFMBlock(nn.Module):
    """Field-aware pairwise crosses (VideoDnn.py:11-25).

    ``ffm_slots`` is a list of (x_slot_list, y_slot_list, dim) triples; the
    input is a dict slot_id -> (B, D) embedding.
    """

    ffm_slots: Sequence[Tuple[Tuple[str, ...], Tuple[str, ...], int]]

    @nn.compact
    def __call__(self, slot_dict: Dict[str, jnp.ndarray]):
        ffm: List[jnp.ndarray] = []
        for x_list, y_list, dim in self.ffm_slots:
            for x in x_list:
                for y in y_list:
                    x_emb = Dense(dim, activation=None,
                                  name=f"ffm_x_{x}_{y}_{dim}")(slot_dict[x])
                    y_emb = Dense(dim, activation=None,
                                  name=f"ffm_y_{x}_{y}_{dim}")(slot_dict[y])
                    ffm.append(x_emb * y_emb)
        return jnp.concatenate(ffm, axis=-1)
