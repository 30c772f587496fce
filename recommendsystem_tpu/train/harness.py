"""Training harness: the missing platform driver the reference's contracts
imply (SURVEY §2.9 — dataset -> model factory -> compile -> fit/predict ->
checkpoint -> dump_predict)."""

from __future__ import annotations

import logging
import time
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from ..models.base import ModelBundle
from . import metrics as M
from .checkpoint import restore_checkpoint, save_checkpoint
from .state import TrainState, create_train_state
from .step import (make_eval_step, make_predict_step, make_scan_train_step,
                   make_train_step)

log = logging.getLogger(__name__)


def fit(bundle: ModelBundle, dataset: Iterable, steps: Optional[int] = None,
        state: Optional[TrainState] = None, rng=None, mesh=None,
        mode: str = "local", log_every: int = 100,
        checkpoint_dir: Optional[str] = None, checkpoint_every: int = 0,
        resume: bool = False, profile_dir: Optional[str] = None,
        profile_steps: tuple = (10, 20), history_path: Optional[str] = None,
        nan_guard: str = "warn", callbacks=(),
        evict_every: int = 0, scan_steps: int = 0) -> TrainState:
    """``dataset`` yields (batch, dense_inputs, labels, sample_weight).

    ``resume=True`` restores the latest checkpoint under ``checkpoint_dir``
    before training (crash recovery).  ``profile_dir`` captures an XLA/TPU
    profiler trace over ``profile_steps``; ``history_path`` appends one JSON
    line per ``log_every`` steps (step, losses, examples/s) — the training
    observability the reference lacks entirely (SURVEY §5).  ``nan_guard``
    ('off'|'warn'|'raise') checks loss finiteness at each log point (checked
    there rather than every step to avoid a per-step device sync).
    ``evict_every=N`` applies the optimizer's ``feature_drop_show``
    admission/eviction every N steps (fresh-row resurrect semantics).
    ``scan_steps=K`` batches K dataset items into ONE device dispatch via
    ``lax.scan`` (the on-device training loop — numerically identical to K
    single steps; short tails fall back to single steps).  Log/checkpoint/
    evict cadences then fire at the first step boundary at or after their
    nominal step.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    train_step = make_train_step(bundle, mesh=mesh, mode=mode)
    scan_step = (make_scan_train_step(bundle, mesh=mesh, mode=mode)
                 if scan_steps > 1 else None)

    it = iter(dataset)
    first = None
    if state is None:
        first = next(it)
        batch, dense_inputs, labels, weight = first
        rng, init_rng = jax.random.split(rng)
        state = create_train_state(bundle, init_rng, batch, dense_inputs)

    if resume and checkpoint_dir:
        import os
        if os.path.isdir(checkpoint_dir) and any(
                d.isdigit() for d in os.listdir(checkpoint_dir)):
            state = restore_checkpoint(checkpoint_dir, state)
            log.info("resumed from %s at step %d", checkpoint_dir,
                     int(state.step))

    profiling = False
    t0 = time.time()
    seen = 0
    i = 0
    while steps is None or i < steps:
        if first is not None:
            item = first
            first = None
        else:
            try:
                item = next(it)
            except StopIteration:
                break
        if profile_dir and i >= profile_steps[0] and not profiling:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        batch, dense_inputs, labels, weight = item
        chunk = [item]
        if scan_step is not None:
            while len(chunk) < scan_steps and (steps is None
                                               or i + len(chunk) < steps):
                try:
                    chunk.append(next(it))
                except StopIteration:
                    break
        if len(chunk) > 1:
            stack = lambda idx: jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[c[idx] for c in chunk])
            sb, sl = stack(0), stack(2)
            sw = np.stack([np.asarray(c[3]) for c in chunk])
            sd = stack(1) if dense_inputs is not None else None
            rng, step_rng = jax.random.split(rng)
            state, infos = scan_step(state, sb, sl, sw, sd,
                                     jax.random.split(step_rng, len(chunk)))
            info = jax.tree.map(lambda x: x[-1], infos)
            seen += sum(next(iter(jax.tree.leaves(c[0]))).shape[0]
                        for c in chunk)
            i += len(chunk)
        else:
            rng, step_rng = jax.random.split(rng)
            state, info = train_step(state, batch, labels, weight,
                                     dense_inputs, step_rng)
            seen += next(iter(jax.tree.leaves(batch))).shape[0]
            i += 1
        if profiling and i >= profile_steps[1]:
            jax.block_until_ready(info["loss"])
            jax.profiler.stop_trace()
            profiling = False
            log.info("profiler trace written to %s", profile_dir)
        stride = len(chunk)
        crossed = lambda every: every and (i // every) > ((i - stride) // every)
        if crossed(log_every):
            info = jax.device_get(info)
            rate = seen / (time.time() - t0)
            log.info("step %d loss=%.5f examples/s=%.1f", i, info["loss"], rate)
            if nan_guard != "off" and not np.isfinite(info["loss"]):
                msg = f"non-finite loss {info['loss']} at step {i}"
                if nan_guard == "raise":
                    raise FloatingPointError(msg)
                log.warning(msg)
            if history_path:
                import json
                rec = {"step": int(state.step), "examples_per_sec": round(rate, 1)}
                rec.update({k: float(v) for k, v in info.items()})
                with open(history_path, "a") as hf:
                    hf.write(json.dumps(rec) + "\n")
        if crossed(evict_every):
            # in-training admission/eviction at the optimizer's own
            # feature_drop_show threshold (tn.core.AdaGrad semantics)
            rng, evict_rng = jax.random.split(rng)
            state = TrainState(params=state.params, opt_state=state.opt_state,
                               tables=bundle.embedding.maybe_evict(
                                   state.tables, evict_rng),
                               step=state.step)
        if checkpoint_dir and crossed(checkpoint_every):
            save_checkpoint(checkpoint_dir, state)
        for cb in callbacks:
            cb(i, state, info)
    if profiling:
        jax.profiler.stop_trace()
    return state


def evaluate(bundle: ModelBundle, dataset: Iterable, state: TrainState,
             mode: str = "local") -> Dict[str, Dict[str, float]]:
    eval_step = make_eval_step(bundle, mode=mode)
    metric_states = M.init_metrics(bundle.metrics)
    for batch, dense_inputs, labels, weight in dataset:
        metric_states, _ = eval_step(state, batch, labels, weight, dense_inputs,
                                     metric_states)
    out = M.compute_metrics(bundle.metrics, metric_states)
    return jax.device_get(out)


def predict(bundle: ModelBundle, dataset: Iterable, state: TrainState,
            mode: str = "local", example_id_key: Optional[str] = None):
    """Yields (example_ids, predict outputs) per batch — the
    ``example_id_slot`` dump contract (``rank/multi_head/multidnn.py:250``)."""
    predict_step = make_predict_step(bundle, mode=mode)
    for item in dataset:
        batch, dense_inputs = item[0], item[1]
        extra = item[4] if len(item) > 4 else None
        outputs = jax.device_get(predict_step(state, batch, dense_inputs))
        ids = None
        if extra is not None and example_id_key is not None:
            ids = extra.get(example_id_key)
        yield ids, outputs


def dump_predict(bundle: ModelBundle, dataset: Iterable, state: TrainState,
                 path: str, mode: str = "local",
                 example_id_key: str = "example_id",
                 need_y: bool = False) -> int:
    """Write ``example_id \\t task=score...`` TSV (the dump_predict util the
    reference imports from its absent platform, ``rank/multi_head/model.py:9``).

    ``need_y=True`` appends the per-task labels after the scores — the
    reference's debug ``model_whit_input`` variant
    (``rank/multi_head/multidnn.py:252-258``).
    """
    n = 0
    tasks = None
    dataset = list(dataset) if need_y else dataset
    label_iter = iter(dataset)
    with open(path, "w") as f:
        for ids, outputs in predict(bundle, dataset, state, mode=mode,
                                    example_id_key=example_id_key):
            if tasks is None:
                tasks = sorted(outputs.keys())
            labels = None
            if need_y:
                item = next(label_iter)
                labels = item[2]
            batch_n = len(next(iter(outputs.values())))
            for row in range(batch_n):
                eid = ids[row] if ids is not None else n
                cols = [str(eid)] + ["%.6g" % float(np.ravel(outputs[t][row])[0])
                                     for t in tasks]
                if labels is not None:
                    cols += ["%.6g" % float(np.ravel(labels[t][row])[-1])
                             for t in tasks if t in labels]
                f.write("\t".join(cols) + "\n")
                n += 1
    return n
