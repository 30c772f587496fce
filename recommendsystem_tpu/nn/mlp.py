"""Dense / MLP building blocks with Keras-matching defaults.

The reference builds everything from ``tf.keras.layers.Dense`` (glorot_uniform
kernel, zero bias) plus the generic ``DNN`` layer at
``rough_rank/layer.py:33-117`` and the implied ``MultiLayerDense`` used by
``autoint:40-50``.  Initializer parity matters for AUC parity (SURVEY §7).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ACTIVATIONS = {
    None: lambda x: x,
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softmax": jax.nn.softmax,
    "gelu": jax.nn.gelu,
}


def resolve_activation(act) -> Callable:
    if callable(act):
        return act
    try:
        return ACTIVATIONS[act]
    except KeyError:
        raise ValueError(f"unknown activation {act!r}")


class Dense(nn.Module):
    """Keras-parity Dense: glorot_uniform kernel, zeros bias, fused activation.

    ``kernel_regularizer=(l1, l2)`` mirrors ``tf.keras.regularizers.L1L2``;
    the penalty is sowed into the ``"losses"`` collection and picked up by the
    training loss (see ``train/step.py``), matching Keras's
    ``model.losses`` mechanism used at e.g. ``rank/ctr/model_init.py:75``.
    """

    features: int
    activation: Any = None
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.glorot_uniform()
    bias_init: Callable = nn.initializers.zeros_init()
    kernel_regularizer: Optional[Tuple[float, float]] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias
        if self.kernel_regularizer is not None:
            l1, l2 = self.kernel_regularizer
            penalty = l1 * jnp.sum(jnp.abs(kernel)) + l2 * jnp.sum(jnp.square(kernel))
            self.sow("losses", "regularization", penalty,
                     reduce_fn=lambda a, b: a + b, init_fn=lambda: jnp.float32(0))
        return resolve_activation(self.activation)(y)


class MultiLayerDense(nn.Module):
    """Stack of Dense layers with one activation (``autoint:40-41,49-50``)."""

    units: Sequence[int]
    activation: Any = "relu"

    @nn.compact
    def __call__(self, x):
        for i, unit in enumerate(self.units):
            x = Dense(unit, activation=self.activation, name=f"dense_{i}")(x)
        return x


class DNN(nn.Module):
    """The generic MLP of ``rough_rank/layer.py:33-117``.

    GlorotNormal kernels (NOT glorot_uniform — the reference's DNN overrides
    the Keras default at ``layer.py:75``), zero biases, optional BN/dropout,
    ``output_activation`` overriding the last layer's activation.
    """

    hidden_units: Sequence[int]
    activation: Any = "relu"
    l2_reg: float = 0.0
    dropout_rate: float = 0.0
    use_bn: bool = False
    output_activation: Any = None
    seed: Optional[int] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        n = len(self.hidden_units)
        for i, unit in enumerate(self.hidden_units):
            act = self.activation
            if self.output_activation is not None and i == n - 1:
                act = self.output_activation
            kernel = self.param(f"kernel{i}", nn.initializers.glorot_normal(),
                                (x.shape[-1], unit))
            bias = self.param(f"bias{i}", nn.initializers.zeros_init(), (unit,))
            if self.l2_reg:
                self.sow("losses", "regularization",
                         self.l2_reg * jnp.sum(jnp.square(kernel)),
                         reduce_fn=lambda a, b: a + b, init_fn=lambda: jnp.float32(0))
            x = jnp.dot(x, kernel, preferred_element_type=jnp.float32) + bias
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not training, name=f"bn{i}")(x)
            x = resolve_activation(act)(x)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not training,
                               name=f"dropout{i}")(x)
        return x
