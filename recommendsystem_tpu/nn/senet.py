"""SENet field reweighting — both reference squeeze variants.

- ``squeeze="mean"``: ctr variant (``rank/ctr/model_init.py:22-41``) — squeeze
  each field embedding to its scalar mean, concat to (B, F).
- ``squeeze="concat"``: staytime variant (``staytime/VideoDnn.py:80-96``) —
  concat the full field embeddings to (B, F*D).

Common trunk: stop_gradient on the squeezed input, Dense(F//reduction, relu),
``2 * Dense(F, sigmoid)``, then per-field scalar reweighting.
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mlp import Dense


class SENet(nn.Module):
    squeeze: str = "mean"      # "mean" | "concat"
    reduction: int = 4

    @nn.compact
    def __call__(self, field_embs: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        f = len(field_embs)
        if self.squeeze == "mean":
            squeezed = jnp.concatenate(
                [jnp.mean(e, axis=1, keepdims=True) for e in field_embs], axis=1)
        elif self.squeeze == "concat":
            squeezed = jnp.concatenate(list(field_embs), axis=-1)
        else:
            raise ValueError(self.squeeze)
        squeezed = jax.lax.stop_gradient(squeezed)
        h = Dense(f // self.reduction, activation="relu",
                  name="senet_squeeze_layer")(squeezed)
        gates = 2.0 * Dense(f, activation="sigmoid",
                            name="senet_extract_layer")(h)       # (B, F)
        return [emb * gates[:, i:i + 1] for i, emb in enumerate(field_embs)]
