"""Deep & Cross layers — both reference parameterizations.

- ``DeepCrossLayer``: ``staytime/layer.py:44-80``; per-layer ``W: (dim, 1)``
  glorot_uniform and ``b: (dim,)`` zeros; update
  ``cross = inputs_or_cross * (cross @ W) + b + cross`` with the FIRST layer
  multiplying by ``inputs`` (== x0) and later layers multiplying by the
  running ``cross`` (a deliberate deviation from DCN-v1: ``layer.py:67-71``).
- ``CrossNet``: ``rough_rank/layer.py:236-270``; GlorotNormal kernels
  ``(dim, 1)``, bias ``(dim, 1)`` zeros; canonical DCN-v1 recurrence
  ``x_{l+1} = x0 * (x_l @ W) + b + x_l``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DeepCrossLayer(nn.Module):
    num_layer: int = 3

    @nn.compact
    def __call__(self, inputs):
        dim = inputs.shape[-1]
        cross = inputs
        for i in range(self.num_layer):
            w = self.param(f"w_{i}", nn.initializers.glorot_uniform(), (dim, 1))
            b = self.param(f"b_{i}", nn.initializers.zeros_init(), (dim,))
            scalar = jnp.dot(cross, w, preferred_element_type=jnp.float32)  # (B, 1)
            base = inputs if i == 0 else cross
            cross = base * scalar + b + cross
        return cross


class CrossNet(nn.Module):
    layer_num: int = 2
    l2_reg: float = 0.0
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs):
        dim = inputs.shape[-1]
        x0 = inputs
        xl = inputs
        for i in range(self.layer_num):
            w = self.param(f"kernel{i}", nn.initializers.glorot_normal(), (dim, 1))
            b = self.param(f"bias{i}", nn.initializers.zeros_init(), (dim, 1))
            if self.l2_reg:
                self.sow("losses", "regularization",
                         self.l2_reg * jnp.sum(jnp.square(w)),
                         reduce_fn=lambda a, c: a + c, init_fn=lambda: jnp.float32(0))
            xw = jnp.dot(xl, w, preferred_element_type=jnp.float32)  # (B, 1)
            xl = x0 * xw + b[:, 0] + xl
        return xl
