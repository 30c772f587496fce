"""Per-user GAUC evaluation over model predictions.

Bridges the training stack and the offline search stack: run the jitted
predict step over a dataset carrying user ids, then compute the per-user
impression-weighted GAUC that drives the reference's fusion search
(``gaussain/gaussian_model_utils.py:242-280``) for each task head.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import numpy as np

from ..models.base import ModelBundle
from ..search.gauc import group_auc
from .state import TrainState
from .step import make_predict_step


def evaluate_gauc(bundle: ModelBundle, dataset: Iterable, state: TrainState,
                  user_key: str = "user_id", mode: str = "local",
                  spearman_tasks: tuple = ()) -> Dict[str, float]:
    """``dataset`` yields (batch, dense_inputs, labels, weight, extras) with
    ``extras[user_key]`` carrying the grouping ids.  Returns task -> GAUC."""
    predict_step = make_predict_step(bundle, mode=mode)
    preds: Dict[str, list] = {}
    labels_acc: Dict[str, list] = {}
    users: list = []
    for item in dataset:
        batch, dense_inputs, labels, _weight, extras = item
        outputs = jax.device_get(predict_step(state, batch, dense_inputs))
        users.append(np.asarray(extras[user_key]))
        for task in bundle.metrics:
            if task not in outputs or task not in labels:
                continue
            preds.setdefault(task, []).append(
                np.asarray(outputs[task]).reshape(len(users[-1]), -1)[:, -1])
            labels_acc.setdefault(task, []).append(
                np.asarray(labels[task]).reshape(len(users[-1]), -1)[:, -1])

    user_ids = np.concatenate(users)
    out = {}
    for task in preds:
        p = np.concatenate(preds[task])
        y = np.concatenate(labels_acc[task])
        total, n = group_auc(y, p, user_ids,
                             is_spearman=task in spearman_tasks)
        out[task] = total / n if n else 0.0
    return out
