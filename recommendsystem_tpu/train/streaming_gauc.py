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
    # predictions are binned uniformly over [lo, hi); values OUTSIDE the
    # range are clipped into the edge bins (they become ties there, which
    # silently degrades the metric on a misconfigured range — e.g. pointing
    # the default [0, 1) at an unbounded head like the staytime EV output).
    # state["oor"] counts clipped examples so callers can detect this.
    lo: float = 0.0
    hi: float = 1.0
    hash_ids: bool = True

    def init(self):
        z = jnp.zeros((self.num_buckets, self.num_bins), jnp.float32)
        return {"pos": z, "neg": z, "oor": jnp.zeros((), jnp.float32)}

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
        oor = jnp.sum(((p < self.lo) | (p >= self.hi)).astype(jnp.float32))
        return {"pos": state["pos"].at[u, b].add(w * y),
                "neg": state["neg"].at[u, b].add(w * (1.0 - y)),
                "oor": state.get("oor", jnp.zeros((), jnp.float32)) + oor}

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


@dataclasses.dataclass(frozen=True)
class StreamingSpearmanGauc:
    """Streaming variant of the continuous-label "consistency AUC"
    (``pso/util.py:19-56`` / ``float_label_auc``): per user-bucket, the
    fraction of CONCORDANT (pred, label) pairs — higher prediction AND
    higher label.  (The reference counts these via its merge-sort "inverse
    pairs" under a prediction-DESCENDING sort, so concordant pairs are what
    its 'inversions' are; 1.0 = perfect order consistency.)  The offline
    metric's offline-only status was a documented gap; this closes it with
    a per-bucket 2-D (pred bin × label bin) histogram, from which the
    concordant pair count is a 2-D prefix sum.  Pairs tied in prediction
    bin get 0.5 credit (the offline metric resolves them by stable sort
    order — exact agreement whenever predictions land in distinct bins).

    Matches ``search.gauc.group_auc(..., is_spearman=True)`` weighting:
    per-bucket value × impressions, skipping single-label buckets.
    """

    num_buckets: int = 1024
    pred_bins: int = 32
    label_bins: int = 32
    pred_lo: float = 0.0
    pred_hi: float = 1.0
    label_lo: float = 0.0
    label_hi: float = 1.0
    hash_ids: bool = True

    def init(self):
        return {"hist": jnp.zeros(
            (self.num_buckets, self.pred_bins, self.label_bins), jnp.float32)}

    def _bin(self, x, lo, hi, n):
        scale = n / (hi - lo)
        return jnp.clip(((x - lo) * scale).astype(jnp.int32), 0, n - 1)

    def update(self, state, y_true: jnp.ndarray, y_pred: jnp.ndarray,
               user_ids: jnp.ndarray, weight: Optional[jnp.ndarray] = None):
        y = y_true.reshape(-1).astype(jnp.float32)
        p = y_pred.reshape(-1).astype(jnp.float32)
        u = user_ids.reshape(-1)
        if self.hash_ids:
            u = mix32(u)
        else:
            u = u.astype(jnp.uint32)
        u = (u % jnp.uint32(self.num_buckets)).astype(jnp.int32)
        pb = self._bin(p, self.pred_lo, self.pred_hi, self.pred_bins)
        lb = self._bin(y, self.label_lo, self.label_hi, self.label_bins)
        w = jnp.ones_like(y) if weight is None else \
            jnp.broadcast_to(weight.reshape(-1), y.shape).astype(jnp.float32)
        return {"hist": state["hist"].at[u, pb, lb].add(w)}

    def compute_parts(self, state):
        h = state["hist"]                              # (U, P, L)
        # concordant pairs: one element strictly below in BOTH pred and label
        # bin (= the reference's merge-sort 'inverse pairs' under its
        # prediction-descending sort) — count via exclusive 2-D prefix sums
        cp = jnp.cumsum(h, axis=1)                     # inclusive over pred
        cpl = jnp.cumsum(cp, axis=2)                   # inclusive over both
        below_both = cpl - cp - jnp.cumsum(h, axis=2) + h   # exclusive 2-D
        concordant = jnp.sum(h * below_both, axis=(1, 2))
        # pairs tied in pred bin with differing label bins get 0.5 credit:
        # (Σ_p n_p² − Σ_{p,l} h²)/2 counts exactly those pairs
        tied_pred_diff_label = (jnp.sum(jnp.sum(h, axis=2) ** 2, axis=1)
                                - jnp.sum(h * h, axis=(1, 2))) / 2.0
        concordant = concordant + 0.5 * tied_pred_diff_label

        n = jnp.sum(h, axis=(1, 2))
        total_pairs = n * (n - 1) / 2.0
        value = concordant / jnp.maximum(total_pairs, 1e-12)
        # single-label buckets carry zero weight (group_auc skip rule)
        label_tot = jnp.sum(h, axis=1)                 # (U, L)
        multi_label = jnp.sum((label_tot > 0).astype(jnp.int32), axis=1) > 1
        w = jnp.where(multi_label & (n > 1), n, 0.0)
        return jnp.sum(value * w), jnp.sum(w)

    def compute(self, state) -> jnp.ndarray:
        total, denom = self.compute_parts(state)
        return total / jnp.maximum(denom, 1e-12)
