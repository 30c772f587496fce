"""Loss functions — every loss the reference defines, kept numerically exact.

Sources: ``rank/ctr/base_model.py:7-12``, ``rank/multi_head/model.py:18-22``,
``staytime/model.py:20-60``, ``rough_rank/model.py:190-203``, plus Keras
``BinaryCrossentropy`` used by ``rough_rank/model.py:211-212``.
"""

from __future__ import annotations

import jax.numpy as jnp

K_EPSILON = 1e-7   # tf.keras.backend.epsilon()


def cross_entropy_sum_mean(y_true, y_pred, a: float = 1.0):
    """ctr/finish CE: −y·log(p+1e-6) − (a−y)·log(1−p+1e-6), summed over the
    label axis then batch-mean (``base_model.py:7-12``)."""
    y_true = y_true.astype(jnp.float32)
    loss = (- y_true * jnp.log(y_pred + 1e-6)
            - (a - y_true) * jnp.log(1.0 - y_pred + 1e-6))
    return jnp.mean(jnp.sum(loss, axis=1), axis=0)


def cross_entropy_per_sample(y_true, y_pred, a: float = 1.0):
    """multi_head CE: per-sample sum, no batch reduction
    (``rank/multi_head/model.py:18-22``)."""
    y_true = y_true.astype(jnp.float32)
    loss = (- y_true * jnp.log(y_pred + 1e-6)
            - (a - y_true) * jnp.log(1.0 - y_pred + 1e-6))
    return jnp.sum(loss, axis=-1, keepdims=True)


def cross_entropy_elementwise(y_true, y_pred, a: float = 1.0):
    """staytime CE: elementwise, no reduction (``staytime/model.py:33-36``)."""
    y_true = y_true.astype(jnp.float32)
    return (- y_true * jnp.log(y_pred + 1e-6)
            - (a - y_true) * jnp.log(1.0 - y_pred + 1e-6))


def kl_loss(y_true, y_pred, multiclass_num: int = 400):
    """staytime KL over the first ``multiclass_num`` dims
    (``staytime/model.py:20-30``); last dim of y carries the raw label."""
    y_true_1 = y_true[:, 0:multiclass_num].astype(y_pred.dtype)
    y_pred_1 = y_pred[:, 0:multiclass_num]
    y_true_1 = jnp.clip(y_true_1, K_EPSILON, 1.0)
    y_pred_1 = jnp.clip(y_pred_1, K_EPSILON, 1.0)
    return jnp.sum(y_true_1 * jnp.log(y_true_1 / y_pred_1), axis=-1)


def mse_clip_loss(y_true, y_pred, clip: float = 2.0):
    """staytime (unused-in-compile) mse with label clip (``model.py:39-44``)."""
    y_true = jnp.minimum(y_true.astype(jnp.float32), clip)
    return jnp.mean(jnp.square(y_true - y_pred))


def huber_loss(y_true, y_pred, clip_delta: float = 1.0):
    """``staytime/model.py:54-60``."""
    error = y_true - y_pred
    cond = jnp.abs(error) < clip_delta
    squared = 0.5 * jnp.square(error)
    linear = clip_delta * (jnp.abs(error) - 0.5 * clip_delta)
    return jnp.where(cond, squared, linear)


def log_mse_loss(y_true, y_pred, upper: float = 5.3):
    """rough_rank watch-time mse on log1p(ms/1000), clipped
    (``rough_rank/model.py:190-198``)."""
    y_true = y_true.astype(jnp.float32) / 1000.0
    wt_log = jnp.log(y_true + 1.0)
    y_true_clip = jnp.minimum(wt_log, upper)
    return jnp.mean(jnp.square(y_true_clip - y_pred))


def y_pred_loss(y_true, y_pred):
    """Pass-through loss for pre-computed per-sample losses (the KD head,
    ``rough_rank/model.py:201-203,213``)."""
    return jnp.mean(y_pred)


def binary_cross_entropy(y_true, y_pred):
    """Keras BinaryCrossentropy (probabilities, eps-clipped, mean)."""
    y_true = y_true.astype(jnp.float32)
    p = jnp.clip(y_pred, K_EPSILON, 1.0 - K_EPSILON)
    loss = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log(1.0 - p))
    return jnp.mean(loss)


LOSSES = {
    "cross_entropy_sum_mean": cross_entropy_sum_mean,
    "cross_entropy_per_sample": cross_entropy_per_sample,
    "cross_entropy_elementwise": cross_entropy_elementwise,
    "kl": kl_loss,
    "mse_clip": mse_clip_loss,
    "huber": huber_loss,
    "log_mse": log_mse_loss,
    "y_pred": y_pred_loss,
    "bce": binary_cross_entropy,
}
