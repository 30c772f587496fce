"""Streaming metrics — functional (init/update/compute) so they live inside
the jitted eval step and psum cleanly across the data axis.

Covers the compile-time metric sets of the reference: Keras ``'acc'`` /
``BinaryAccuracy`` / ``AUC()`` plus tensornet-native ``tn.metric.COPC()`` and
``tn.metric.CTR()`` (``rank/ctr/base_model.py:183-190``,
``rough_rank/model.py:215-219``) and the staytime custom EV metrics
(``staytime/model.py:79-83``, module absent upstream — implemented as
accuracy/MAE/MSE on the expected-value output vs the raw watch-time label).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Metric:
    name: str
    init: Callable[[], Any]
    update: Callable[[Any, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]], Any]
    compute: Callable[[Any], jnp.ndarray]


def _w(y, weight):
    return jnp.ones_like(y) if weight is None else jnp.broadcast_to(weight, y.shape)


def binary_accuracy(threshold: float = 0.5, name: str = "acc") -> Metric:
    def init():
        return {"correct": jnp.float32(0), "total": jnp.float32(0)}

    def update(s, y_true, y_pred, weight=None):
        y_true = y_true.astype(jnp.float32)
        pred = (y_pred > threshold).astype(jnp.float32)
        w = _w(y_true, weight)
        return {"correct": s["correct"] + jnp.sum(w * (pred == y_true)),
                "total": s["total"] + jnp.sum(w)}

    return Metric(name, init, update, lambda s: s["correct"] / jnp.maximum(s["total"], 1.0))


def auc(num_thresholds: int = 200, name: str = "auc") -> Metric:
    """Keras-style bucketed streaming ROC-AUC with trapezoidal interpolation."""
    # Keras places thresholds at [-eps, ..., 1+eps] with num_thresholds points
    eps = 1e-7
    thresholds = jnp.concatenate([
        jnp.array([-eps]),
        jnp.linspace(0.0, 1.0, num_thresholds - 1, endpoint=False)[1:],
        jnp.array([1.0 + eps])])

    def init():
        z = jnp.zeros((thresholds.shape[0],), jnp.float32)
        return {"tp": z, "fp": z, "tn": z, "fn": z}

    def update(s, y_true, y_pred, weight=None):
        y_true = y_true.reshape(-1).astype(jnp.float32)
        y_pred = y_pred.reshape(-1)
        w = _w(y_true, None if weight is None else weight.reshape(-1))
        above = (y_pred[None, :] > thresholds[:, None]).astype(jnp.float32)  # (T, N)
        pos = (y_true * w)[None, :]
        neg = ((1.0 - y_true) * w)[None, :]
        return {"tp": s["tp"] + jnp.sum(above * pos, axis=1),
                "fp": s["fp"] + jnp.sum(above * neg, axis=1),
                "fn": s["fn"] + jnp.sum((1 - above) * pos, axis=1),
                "tn": s["tn"] + jnp.sum((1 - above) * neg, axis=1)}

    def compute(s):
        tpr = s["tp"] / jnp.maximum(s["tp"] + s["fn"], 1e-12)
        fpr = s["fp"] / jnp.maximum(s["fp"] + s["tn"], 1e-12)
        # thresholds ascend -> tpr/fpr descend; integrate over fpr
        return jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0)

    return Metric(name, init, update, compute)


def copc(name: str = "copc") -> Metric:
    """Click-Over-Predicted-Click calibration = sum(label)/sum(pred)."""
    def init():
        return {"label": jnp.float32(0), "pred": jnp.float32(0)}

    def update(s, y_true, y_pred, weight=None):
        y_true = y_true.astype(jnp.float32)
        w = _w(y_true, weight)
        return {"label": s["label"] + jnp.sum(w * y_true),
                "pred": s["pred"] + jnp.sum(w * y_pred.reshape(y_true.shape))}

    return Metric(name, init, update, lambda s: s["label"] / jnp.maximum(s["pred"], 1e-12))


def ctr(name: str = "ctr") -> Metric:
    """Label mean (tn.metric.CTR)."""
    def init():
        return {"label": jnp.float32(0), "n": jnp.float32(0)}

    def update(s, y_true, y_pred, weight=None):
        y_true = y_true.astype(jnp.float32)
        w = _w(y_true, weight)
        return {"label": s["label"] + jnp.sum(w * y_true), "n": s["n"] + jnp.sum(w)}

    return Metric(name, init, update, lambda s: s["label"] / jnp.maximum(s["n"], 1.0))


def _ev_pair(y_true, y_pred, multiclass_num):
    """staytime custom metrics compare the EV output (last col of the train
    head) with the raw watch-time carried in the last label column."""
    t = y_true[:, -1]
    p = y_pred[:, -1] if y_pred.ndim > 1 and y_pred.shape[-1] > 1 else y_pred.reshape(-1)
    return t.astype(jnp.float32), p


def ev_mae(multiclass_num: int = 400, name: str = "mae") -> Metric:
    def init():
        return {"err": jnp.float32(0), "n": jnp.float32(0)}

    def update(s, y_true, y_pred, weight=None):
        t, p = _ev_pair(y_true, y_pred, multiclass_num)
        w = _w(t, None if weight is None else weight.reshape(t.shape))
        return {"err": s["err"] + jnp.sum(w * jnp.abs(t - p)), "n": s["n"] + jnp.sum(w)}

    return Metric(name, init, update, lambda s: s["err"] / jnp.maximum(s["n"], 1.0))


def ev_mse(multiclass_num: int = 400, name: str = "mse") -> Metric:
    def init():
        return {"err": jnp.float32(0), "n": jnp.float32(0)}

    def update(s, y_true, y_pred, weight=None):
        t, p = _ev_pair(y_true, y_pred, multiclass_num)
        w = _w(t, None if weight is None else weight.reshape(t.shape))
        return {"err": s["err"] + jnp.sum(w * jnp.square(t - p)), "n": s["n"] + jnp.sum(w)}

    return Metric(name, init, update, lambda s: s["err"] / jnp.maximum(s["n"], 1.0))


def bin_accuracy(bin_edges, multiclass_num: int = 400, name: str = "bin_acc") -> Metric:
    """staytime CustomAccuracy: predicted distribution argmax bin vs the bin
    of the true watch time."""
    edges = jnp.asarray(bin_edges)

    def init():
        return {"correct": jnp.float32(0), "n": jnp.float32(0)}

    def update(s, y_true, y_pred, weight=None):
        true_wt = y_true[:, -1].astype(jnp.float32)
        true_bin = jnp.argmin(jnp.abs(edges[None, :] - true_wt[:, None]), axis=1)
        pred_bin = jnp.argmax(y_pred[:, :multiclass_num], axis=1)
        w = _w(true_wt, None if weight is None else weight.reshape(true_wt.shape))
        return {"correct": s["correct"] + jnp.sum(w * (true_bin == pred_bin)),
                "n": s["n"] + jnp.sum(w)}

    return Metric(name, init, update, lambda s: s["correct"] / jnp.maximum(s["n"], 1.0))


def init_metrics(metrics: Dict[str, list]):
    return {task: [m.init() for m in ms] for task, ms in metrics.items()}


def update_metrics(metrics: Dict[str, list], states, y_true, y_pred, weight=None):
    out = {}
    for task, ms in metrics.items():
        out[task] = [m.update(s, y_true[task], y_pred[task],
                              weight.get(task) if isinstance(weight, dict) else weight)
                     for m, s in zip(ms, states[task])]
    return out


def compute_metrics(metrics: Dict[str, list], states):
    return {task: {m.name: m.compute(s) for m, s in zip(ms, states[task])}
            for task, ms in metrics.items()}
