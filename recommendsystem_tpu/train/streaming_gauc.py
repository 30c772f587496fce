"""Streaming per-user GAUC inside the jitted eval loop.

The reference computes GAUC strictly offline: dump predictions, group by
user in pandas, per-user inversion AUC weighted by impressions
(``gaussain/gaussian_model_utils.py:242-280``).  That engine exists here as
``search/gauc.py``; this module adds what the reference never had — a
GAUC that streams inside the jitted eval step, so online eval on a TPU mesh
can track ranking quality without dumping predictions to the host.

Design (all state is additive, so it composes with ``psum`` / cross-batch
accumulation):

- users hash into ``num_buckets`` buckets (optionally via a 32-bit mixer so
  sequential ids spread uniformly);
- each bucket keeps positive/negative histograms over ``num_bins``
  prediction bins;
- per-bucket AUC via the rank-sum over the histogram (ties inside one bin
  credit 0.5), weighted by the bucket's impressions, skipping single-class
  buckets — the ``group_auc`` weighting of ``gaussian_model_utils.py:262-276``.

Exactness: with ``hash_ids=False``, ids < ``num_buckets`` (one user per
bucket) and predictions that land in distinct bins, this equals the offline
``search.gauc.group_auc`` to rounding.  In production the bucketed value is
a collision-averaged approximation whose bias shrinks as ``num_buckets``
grows (pooling k users into one bucket mixes their pairs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


def mix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer on uint32 — decorrelates sequential user ids before
    the bucket mod (the jit-side analog of ``hash(u)`` in
    ``search/gauc.py::GaucEngine``)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


@dataclasses.dataclass(frozen=True)
class StreamingGauc:
    """Functional (init/update/compute) like ``train.metrics.Metric``, but
    ``update`` additionally takes the per-example user ids."""

    num_buckets: int = 4096
    num_bins: int = 256
    lo: float = 0.0          # prediction range [lo, hi) binned uniformly
    hi: float = 1.0
    hash_ids: bool = True

    def init(self):
        z = jnp.zeros((self.num_buckets, self.num_bins), jnp.float32)
        return {"pos": z, "neg": z}

    def bucket(self, user_ids: jnp.ndarray) -> jnp.ndarray:
        u = user_ids.reshape(-1)
        if self.hash_ids:
            u = mix32(u)
        else:
            u = u.astype(jnp.uint32)
        return (u % jnp.uint32(self.num_buckets)).astype(jnp.int32)

    def update(self, state, y_true: jnp.ndarray, y_pred: jnp.ndarray,
               user_ids: jnp.ndarray, weight: Optional[jnp.ndarray] = None):
        y = y_true.reshape(-1).astype(jnp.float32)
        p = y_pred.reshape(-1).astype(jnp.float32)
        u = self.bucket(user_ids)
        scale = self.num_bins / (self.hi - self.lo)
        b = jnp.clip(((p - self.lo) * scale).astype(jnp.int32),
                     0, self.num_bins - 1)
        w = jnp.ones_like(y) if weight is None else \
            jnp.broadcast_to(weight.reshape(-1), y.shape).astype(jnp.float32)
        return {"pos": state["pos"].at[u, b].add(w * y),
                "neg": state["neg"].at[u, b].add(w * (1.0 - y))}

    def compute(self, state) -> jnp.ndarray:
        """Impression-weighted mean of per-bucket AUCs (single-class buckets
        carry zero weight)."""
        total, denom = self.compute_parts(state)
        return total / jnp.maximum(denom, 1e-12)

    def compute_parts(self, state):
        """(Σ auc_u · n_u, Σ n_u) — the raw pair ``group_auc`` returns, for
        callers that reduce across shards/engines themselves."""
        pos, neg = state["pos"], state["neg"]
        neg_below = jnp.cumsum(neg, axis=1) - neg
        ranksum = jnp.sum(pos * (neg_below + 0.5 * neg), axis=1)   # (U,)
        p_tot = jnp.sum(pos, axis=1)
        n_tot = jnp.sum(neg, axis=1)
        auc = ranksum / jnp.maximum(p_tot * n_tot, 1e-12)
        w = jnp.where((p_tot > 0) & (n_tot > 0), p_tot + n_tot, 0.0)
        return jnp.sum(auc * w), jnp.sum(w)
