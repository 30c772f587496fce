"""Per-row sparse optimizers for embedding tables.

TPU-native equivalents of ``tn.core.Adam`` (``rank/ctr/base_model.py:163,192``)
and ``tn.core.AdaGrad(lr, initial_g2sum, initial_scale[, feature_drop_show])``
(``staytime/VideoDnn.py:233``): per-row state lives with the (row-sharded)
table and updates are LAZY — only rows touched in the batch move, which is the
parameter-server semantics of pushing sparse grads (SURVEY §2.8).

``row_mask`` is (rows, 1) float {0,1}: 1 where the row appeared in the batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SparseAdam:
    learning_rate: float = 5e-5
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    # storage dtype for the per-row m/v moments (arithmetic stays fp32).
    # bf16 halves the optimizer-state HBM traffic of the scatter update —
    # the dominant cost of Adam-table models — at a small moment-precision
    # cost (opt-in, like table_dtype on the engine).
    state_dtype: Any = jnp.float32

    def init_state(self, shape) -> Dict[str, Any]:
        return {
            "m": jnp.zeros(shape, self.state_dtype),
            "v": jnp.zeros(shape, self.state_dtype),
            # per-row step counter drives bias correction lazily, as a PS
            # would: rows absent from a batch do not advance.
            "t": jnp.zeros((shape[0], 1), jnp.float32),
        }

    def table_init(self, rng, shape, dtype=jnp.float32):
        # TF embedding_column default: truncated_normal(stddev=1/sqrt(dim)).
        w = jax.random.truncated_normal(rng, -2.0, 2.0, shape,
                                        jnp.float32) / (shape[1] ** 0.5)
        return w.astype(dtype)

    def update(self, w, grad, state, row_mask):
        t = state["t"] + row_mask
        m_prev = state["m"].astype(jnp.float32)
        v_prev = state["v"].astype(jnp.float32)
        m = jnp.where(row_mask > 0,
                      self.beta1 * m_prev + (1 - self.beta1) * grad, m_prev)
        v = jnp.where(row_mask > 0,
                      self.beta2 * v_prev + (1 - self.beta2) * jnp.square(grad),
                      v_prev)
        t_safe = jnp.maximum(t, 1.0)
        m_hat = m / (1 - self.beta1 ** t_safe)
        v_hat = v / (1 - self.beta2 ** t_safe)
        step = self.learning_rate * m_hat / (jnp.sqrt(v_hat) + self.epsilon)
        w_new = jnp.where(row_mask > 0, w - step, w)
        return w_new, {"m": m.astype(self.state_dtype),
                       "v": v.astype(self.state_dtype), "t": t}

    def update_rows(self, w_rows, grad_rows, state_rows, valid):
        """Row-sliced update for the scatter path: O(batch-rows) HBM traffic
        instead of O(table).  ``valid``: (n, 1) {0,1} for real unique rows."""
        t = state_rows["t"] + valid
        m_prev = state_rows["m"].astype(jnp.float32)
        v_prev = state_rows["v"].astype(jnp.float32)
        m = self.beta1 * m_prev + (1 - self.beta1) * grad_rows
        v = self.beta2 * v_prev + (1 - self.beta2) * jnp.square(grad_rows)
        t_safe = jnp.maximum(t, 1.0)
        m_hat = m / (1 - self.beta1 ** t_safe)
        v_hat = v / (1 - self.beta2 ** t_safe)
        step = self.learning_rate * m_hat / (jnp.sqrt(v_hat) + self.epsilon)
        w_new = w_rows - valid * step
        return w_new, {"m": jnp.where(valid > 0, m, m_prev).astype(self.state_dtype),
                       "v": jnp.where(valid > 0, v, v_prev).astype(self.state_dtype),
                       "t": t}


@dataclasses.dataclass(frozen=True)
class SparseAdaGrad:
    learning_rate: float = 5e-3
    initial_g2sum: float = 0.1
    initial_scale: float = 0.1
    feature_drop_show: float = -1.0   # admission/eviction threshold; -1 = keep all

    def init_state(self, shape) -> Dict[str, Any]:
        # scalar accumulator per row (parameter-server AdaGrad flavour)
        return {"g2sum": jnp.full((shape[0], 1), self.initial_g2sum, jnp.float32)}

    def table_init(self, rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, jnp.float32,
                                  -self.initial_scale,
                                  self.initial_scale).astype(dtype)

    def update(self, w, grad, state, row_mask):
        g2 = jnp.mean(jnp.square(grad), axis=-1, keepdims=True)
        g2sum = jnp.where(row_mask > 0, state["g2sum"] + g2, state["g2sum"])
        step = self.learning_rate * grad / jnp.sqrt(g2sum)
        w_new = jnp.where(row_mask > 0, w - step, w)
        return w_new, {"g2sum": g2sum}

    def update_rows(self, w_rows, grad_rows, state_rows, valid):
        g2 = jnp.mean(jnp.square(grad_rows), axis=-1, keepdims=True)
        g2sum = state_rows["g2sum"] + valid * g2
        step = self.learning_rate * grad_rows / jnp.sqrt(g2sum)
        w_new = w_rows - valid * step
        return w_new, {"g2sum": g2sum}


def make_sparse_optimizer(name: str, **kwargs):
    name = name.lower()
    if name == "adam":
        return SparseAdam(**kwargs)
    if name == "adagrad":
        return SparseAdaGrad(**kwargs)
    raise ValueError(f"unknown sparse optimizer {name!r}")
