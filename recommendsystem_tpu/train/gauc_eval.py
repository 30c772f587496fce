"""Per-user GAUC evaluation over model predictions.

Bridges the training stack and the offline search stack: run the jitted
predict step over a dataset carrying user ids, then compute the per-user
impression-weighted GAUC that drives the reference's fusion search
(``gaussain/gaussian_model_utils.py:242-280``) for each task head.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import ModelBundle
from ..search.gauc import group_auc
from .state import TrainState
from .step import apply_model, make_predict_step
from .streaming_gauc import StreamingGauc


def _per_task(gauc, tasks):
    """Normalize ``gauc`` to {task: metric}: pass one metric for all tasks,
    or a dict mixing ROC (``StreamingGauc``) and continuous-label
    (``StreamingSpearmanGauc``) engines per head.  A dict must cover every
    requested task — a typo'd key would otherwise silently drop a head from
    the returned metrics."""
    if isinstance(gauc, dict):
        missing = [t for t in tasks if t not in gauc]
        if missing:
            raise KeyError(f"gauc dict has no metric for task(s) {missing}; "
                           f"provided keys: {sorted(gauc)}")
        return {t: gauc[t] for t in tasks}
    return {t: gauc for t in tasks}


def make_gauc_eval_step(bundle: ModelBundle, gauc, mode: str = "local",
                        tasks: Optional[tuple] = None):
    """Jitted (state, batch, dense_inputs, labels, user_ids, gauc_states) ->
    gauc_states: predict + streaming-GAUC update per task head, entirely on
    device.  ``gauc`` is one metric or a {task: metric} dict;
    ``gauc_states`` is {task: metric.init()} and is additive, so shard-local
    states psum/sum into the global one."""
    per_task = _per_task(gauc, tuple(tasks or bundle.metrics))

    def step(state: TrainState, batch, dense_inputs, labels, user_ids,
             gauc_states):
        weights = bundle.embedding.weights(state.tables)
        embs = bundle.embedding.lookup(weights, batch, mode=mode)
        outputs = apply_model(bundle, state.params, embs, dense_inputs,
                              training=False)
        outputs = bundle.predict_view(outputs)
        out = {}
        for task, s in gauc_states.items():
            pred = outputs[task].reshape(outputs[task].shape[0], -1)[:, -1]
            y = jnp.asarray(labels[task])
            y = y.reshape(y.shape[0], -1)[:, -1]
            out[task] = per_task[task].update(s, y, pred, user_ids)
        return out

    return jax.jit(step)


def evaluate_gauc_streaming(bundle: ModelBundle, dataset: Iterable,
                            state: TrainState, user_key: str = "user_id",
                            mode: str = "local", tasks: Optional[tuple] = None,
                            gauc=None) -> Dict[str, float]:
    """In-jit variant of :func:`evaluate_gauc` — no host-side prediction dump;
    the per-user state stays on device as bucketed histograms.  ``gauc``: one
    metric for every head, or {task: metric} mixing ``StreamingGauc`` (ROC
    heads) with ``StreamingSpearmanGauc`` (continuous heads, e.g. the
    staytime EV output with its label/pred ranges)."""
    gauc = gauc or StreamingGauc()
    task_list = tuple(tasks or bundle.metrics)
    per_task = _per_task(gauc, task_list)
    step = make_gauc_eval_step(bundle, gauc, mode=mode, tasks=task_list)
    # states come from the REQUESTED task list, not the first batch's label
    # keys: a task appearing only in later batches is still evaluated, and a
    # task missing from some batch fails loudly instead of KeyError-ing
    # inside the jitted step
    states = {t: m.init() for t, m in per_task.items()}
    saw_data = False
    for item in dataset:
        batch, dense_inputs, labels, _weight, extras = item
        missing = [t for t in states if t not in labels]
        if missing:
            raise KeyError(f"batch labels missing task(s) {missing}; "
                           f"label keys: {sorted(labels)}")
        users = jnp.asarray(np.asarray(extras[user_key]))
        states = step(state, batch, dense_inputs, labels, users, states)
        saw_data = True
    if not saw_data:
        return {}
    return {t: float(per_task[t].compute(s)) for t, s in states.items()}


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
