"""Jit-compiled train / eval / predict steps.

Keras-compile semantics re-expressed functionally (``rank/ctr/
base_model.py:179-196``): total loss = Σ_task loss_weight · weighted-mean
(loss_fn(y, pred)) + Σ regularization (the ``losses`` sow collection, i.e.
Keras ``model.losses``).  Dense grads are averaged across the data axis by
XLA (params replicated, batch sharded — the ``tn.optimizer.Optimizer``
dense-averaging contract); sparse grads apply lazily per-row via the
embedding engine (the PS push contract).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.base import ModelBundle
from . import metrics as M
from .state import TrainState


def _cast_floating(tree, dtype):
    """Cast float leaves of a pytree (params/embeddings/outputs) to ``dtype``;
    bool masks and integer ids pass through."""
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def apply_model(bundle: ModelBundle, params, embs, dense_inputs=None,
                training: bool = False, rngs=None, mutable=False):
    """One place every step applies the flax module, honoring the bundle's
    mixed-precision policy: master params stay fp32 in the train state; with
    ``compute_dtype=bfloat16`` they (and the embedding activations) are cast
    at use and outputs cast back to fp32, so losses/metrics/optimizer math is
    always fp32 — the standard TPU mixed-precision recipe."""
    dtype = getattr(bundle, "compute_dtype", None)
    params = _cast_floating(params, dtype)
    embs = _cast_floating(embs, dtype)
    kwargs = {}
    if dense_inputs is not None:
        kwargs["dense_inputs"] = _cast_floating(dense_inputs, dtype)
    out = bundle.module.apply({"params": params}, embs, training=training,
                              rngs=rngs, mutable=mutable, **kwargs)
    if mutable:
        outputs, mutated = out
        return _cast_floating(outputs, jnp.float32 if dtype else None), mutated
    return _cast_floating(out, jnp.float32 if dtype else None)


def _weighted_task_loss(loss_fn, y, pred, sample_weight):
    """Keras loss reduction: scalar losses pass through; per-sample /
    per-element losses are (sample-weighted) means."""
    raw = loss_fn(jnp.asarray(y), pred)
    if raw.ndim == 0:
        return raw
    if sample_weight is not None:
        w = jnp.broadcast_to(jnp.asarray(sample_weight).reshape(raw.shape[0], *([1] * (raw.ndim - 1))), raw.shape)
        return jnp.sum(raw * w) / jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.mean(raw)


def total_loss_fn(bundle: ModelBundle, params, table_weights, batch, labels,
                  sample_weight=None, dense_inputs=None, training=True,
                  rngs=None, mode: str = "local", mesh: Optional[Mesh] = None):
    if mode == "sharded":
        embs = bundle.embedding.lookup_sharded(table_weights, batch, mesh)
    else:
        embs = bundle.embedding.lookup(table_weights, batch, mode=mode)
    return _model_outputs_and_loss(bundle, params, embs, labels, sample_weight,
                                   dense_inputs, training, rngs)


def _model_outputs_and_loss(bundle, params, embs, labels, sample_weight,
                            dense_inputs, training, rngs):
    outputs, mutated = apply_model(bundle, params, embs, dense_inputs,
                                   training=training, rngs=rngs,
                                   mutable=["losses"])
    loss = jnp.float32(0)
    task_losses = {}
    for task, loss_fn in bundle.losses.items():
        lw = (bundle.loss_weights or {}).get(task, 1.0)
        tl = _weighted_task_loss(loss_fn, labels[task], outputs[task], sample_weight)
        task_losses[task] = tl
        loss = loss + lw * tl
    reg = jnp.float32(0)
    for leaf in jax.tree.leaves(mutated.get("losses", {})):
        reg = reg + jnp.sum(leaf)
    loss = loss + reg
    return loss, {"task_losses": task_losses, "regularization": reg,
                  "outputs": outputs}


def make_train_step(bundle: ModelBundle, mesh: Optional[Mesh] = None,
                    mode: str = "local", donate: bool = True,
                    sparse_update: Optional[str] = None,
                    _body_only: bool = False) -> Callable:
    """Returns jitted (state, batch, labels, sample_weight, dense_inputs,
    dropout_rng) -> (state, metrics_dict).

    ``sparse_update``:
      'packed' (the default, local AND sharded) — the lane-packed fast path
      (``embedding/packed.py``): tables reshape to 128-lane physical rows so
      the gather moves full HBM transactions, lane fold/unfold fuse into the
      gather/scatter, and grads flow only to the folded per-column activations
      (never an E-scale narrow array).  With ``mode='sharded'`` the packed
      512-B physical rows ride the fixed-capacity all-to-all (gather by
      id // Pg, [grad | count] payload push by id // Ps) — the ICI exchange
      at full-transaction granularity.  Storages that can't pack (dim > 42,
      bf16 storage, unaligned offsets) transparently use the classic scatter
      path within the same step; numerics match 'scatter' (tested).
      'scatter' — differentiates w.r.t. the gathered
      (B, L, D) activations and applies scatter row updates: O(batch ids)
      HBM traffic; when sharded, grads route to the owning shard over ICI
      (the PS push).
      'dense' — differentiates through the gather and updates lazily over
      whole tables (O(table) HBM traffic — debugging/reference path only).
    """
    if sparse_update is None:
        # packed is the production fast path in BOTH modes: sharded mode
        # exchanges 512-B physical rows over the bounded all-to-all (STATUS
        # "Beyond-reference scaling"); unpackable storages transparently
        # fall back to the classic scatter exchange within the same step
        sparse_update = "packed"

    import optax
    from ..embedding import packed as packed_mod

    def step_dense(state: TrainState, batch, labels, sample_weight,
                   dense_inputs, rng):
        rngs = {"dropout": rng}

        def lfn(params, weights):
            return total_loss_fn(bundle, params, weights, batch, labels,
                                 sample_weight=sample_weight,
                                 dense_inputs=dense_inputs, training=True,
                                 rngs=rngs, mode=mode, mesh=mesh)

        weights = bundle.embedding.weights(state.tables)
        (loss, aux), (gp, gw) = jax.value_and_grad(lfn, argnums=(0, 1),
                                                   has_aux=True)(state.params, weights)

        updates, opt_state = bundle.dense_optimizer.update(gp, state.opt_state,
                                                           state.params)
        params = optax.apply_updates(state.params, updates)

        counts = bundle.embedding.row_counts(batch)
        tables = bundle.embedding.apply_gradients(state.tables, gw, counts)

        new_state = TrainState(params=params, opt_state=opt_state,
                               tables=tables, step=state.step + 1)
        info = {"loss": loss, **{f"loss/{t}": v for t, v in aux["task_losses"].items()},
                "regularization": aux["regularization"]}
        return new_state, info

    def step_scatter(state: TrainState, batch, labels, sample_weight,
                     dense_inputs, rng):
        rngs = {"dropout": rng}
        weights = bundle.embedding.weights(state.tables)
        if mode == "sharded":
            raw = bundle.embedding.gather_raw_sharded(weights, batch, mesh)
        else:
            raw = bundle.embedding.gather_raw(weights, batch)

        def lfn(params, raw_):
            embs = bundle.embedding.combine_raw(raw_, batch)
            return _model_outputs_and_loss(bundle, params, embs, labels,
                                           sample_weight, dense_inputs,
                                           True, rngs)

        (loss, aux), (gp, graw) = jax.value_and_grad(lfn, argnums=(0, 1),
                                                     has_aux=True)(state.params, raw)

        updates, opt_state = bundle.dense_optimizer.update(gp, state.opt_state,
                                                           state.params)
        params = optax.apply_updates(state.params, updates)

        if mode == "sharded":
            tables = bundle.embedding.apply_gradients_scatter_sharded(
                state.tables, graw, batch, mesh)
        else:
            flat = bundle.embedding.flatten_raw_grads(graw, batch)
            tables = bundle.embedding.apply_gradients_scatter(state.tables, flat)

        new_state = TrainState(params=params, opt_state=opt_state,
                               tables=tables, step=state.step + 1)
        info = {"loss": loss, **{f"loss/{t}": v for t, v in aux["task_losses"].items()},
                "regularization": aux["regularization"]}
        return new_state, info

    def step_packed(state: TrainState, batch, labels, sample_weight,
                    dense_inputs, rng):
        rngs = {"dropout": rng}
        eng = bundle.embedding
        pk_storages, _ = packed_mod.storages_packed(eng)
        plans = packed_mod.plan_segments(eng, batch, storages=set(pk_storages))
        sharded = mode == "sharded"
        # stage 1 (not differentiated): packed gather + lane-fold over the
        # RAW state tables (packed-STATE storages gather their stored
        # physical rows directly).  Sharded mode exchanges packed 512-B
        # physical rows over the all-to-all and returns per-column
        # activations (data-sharded leaves).
        if sharded:
            acts = packed_mod.gather_fold_sharded(eng, state.tables, batch,
                                                  mesh, set(pk_storages))
            ctx = None
        else:
            ctx = packed_mod.gather_fold(eng, state.tables, batch, plans)
            acts = {skey: c["acts"] for skey, c in ctx.items()}
        # columns whose storage can't pack go through the classic fused
        # gather within the same step (weights() unpacks nothing here:
        # classic storages store (rows, D) already)
        classic_batch = {
            k: v for k, v in batch.items()
            if k in eng.columns
            and eng.table_map[eng.columns[k].categorical_column.key][0]
            not in plans}
        if classic_batch:
            weights = eng.weights(state.tables)
            raw = (eng.gather_raw_sharded(weights, classic_batch, mesh)
                   if sharded else eng.gather_raw(weights, classic_batch))
        else:
            raw = {}

        def lfn(params, acts_, raw_):
            if sharded:
                embs = packed_mod.combine_from_col_acts(eng, acts_, batch)
            else:
                embs = packed_mod.combine_from_acts(
                    eng, plans, {s: {"acts": a} for s, a in acts_.items()},
                    batch)
            if raw_:
                embs.update(eng.combine_raw(raw_, classic_batch))
            return _model_outputs_and_loss(bundle, params, embs, labels,
                                           sample_weight, dense_inputs,
                                           True, rngs)

        (loss, aux), (gp, g_acts, graw) = jax.value_and_grad(
            lfn, argnums=(0, 1, 2), has_aux=True)(state.params, acts, raw)

        updates, opt_state = bundle.dense_optimizer.update(gp, state.opt_state,
                                                           state.params)
        params = optax.apply_updates(state.params, updates)

        # stage 3 (not differentiated): lane-unfold + per-table wide
        # scatter + lazy dense optimizer pass.  Sharded mode routes
        # [grad | count] payload rows to owner shards first (the PS push).
        if sharded:
            tables = packed_mod.apply_gradients_packed_sharded(
                eng, state.tables, g_acts, batch, mesh, set(pk_storages))
        else:
            tables = packed_mod.apply_gradients_packed(eng, state.tables,
                                                       g_acts, plans, ctx,
                                                       batch)
        if classic_batch:
            if sharded:
                tables = eng.apply_gradients_scatter_sharded(
                    tables, graw, classic_batch, mesh)
            else:
                flat = eng.flatten_raw_grads(graw, classic_batch)
                tables = eng.apply_gradients_scatter(tables, flat)

        new_state = TrainState(params=params, opt_state=opt_state,
                               tables=tables, step=state.step + 1)
        info = {"loss": loss, **{f"loss/{t}": v for t, v in aux["task_losses"].items()},
                "regularization": aux["regularization"]}
        return new_state, info

    step = {"scatter": step_scatter, "dense": step_dense,
            "packed": step_packed}[sparse_update]
    if _body_only:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_scan_train_step(bundle: ModelBundle, mesh: Optional[Mesh] = None,
                         mode: str = "local", donate: bool = True,
                         sparse_update: Optional[str] = None) -> Callable:
    """Multi-step train driver: ONE dispatch runs ``lax.scan`` over K stacked
    batches — the TPU-idiomatic training loop (drive from the device, not
    per-step host dispatch; the single-step path here is dispatch-latency
    bound, ~0.2-0.3 ms/call through this host).

    Returns jitted (state, batches, labels, sample_weights, dense_inputs,
    rngs) -> (state, stacked_metrics) where every data argument carries a
    leading K axis (``rngs``: (K, 2) from ``jax.random.split``) and
    ``stacked_metrics`` holds each step's scalars, e.g. ``info["loss"][k]``.
    Numerically identical to K sequential ``make_train_step`` calls (tested).
    """
    body = make_train_step(bundle, mesh=mesh, mode=mode, donate=False,
                           sparse_update=sparse_update, _body_only=True)

    def scan_fn(state, batches, labels, sample_weights, dense_inputs, rngs):
        def step(s, xs):
            bt, lb, w, d, rng = xs
            return body(s, bt, lb, w, d, rng)
        return jax.lax.scan(step, state,
                            (batches, labels, sample_weights, dense_inputs,
                             rngs))

    return jax.jit(scan_fn, donate_argnums=(0,) if donate else ())


def _lookup_for_mode(bundle, tables, batch, mode, mesh):
    if mode == "local" and getattr(bundle.embedding, "packed", False):
        from ..embedding import packed as packed_mod
        return packed_mod.lookup_packed(bundle.embedding, tables, batch)
    weights = bundle.embedding.weights(tables)
    if mode == "sharded":
        return bundle.embedding.lookup_sharded(weights, batch, mesh)
    return bundle.embedding.lookup(weights, batch, mode=mode)


def make_eval_step(bundle: ModelBundle, mode: str = "local",
                   mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted (state, batch, labels, sample_weight, dense_inputs,
    metric_states) -> (metric_states, outputs)."""

    def step(state: TrainState, batch, labels, sample_weight, dense_inputs,
             metric_states):
        embs = _lookup_for_mode(bundle, state.tables, batch, mode, mesh)
        outputs = apply_model(bundle, state.params, embs, dense_inputs,
                              training=False)
        y = {t: jnp.asarray(labels[t]) for t in bundle.metrics}
        preds = {t: outputs[t] for t in bundle.metrics}
        metric_states = M.update_metrics(bundle.metrics, metric_states, y, preds,
                                         sample_weight)
        return metric_states, outputs

    return jax.jit(step)


def make_predict_step(bundle: ModelBundle, mode: str = "local",
                      mesh: Optional[Mesh] = None) -> Callable:
    def step(state: TrainState, batch, dense_inputs):
        embs = _lookup_for_mode(bundle, state.tables, batch, mode, mesh)
        outputs = apply_model(bundle, state.params, embs, dense_inputs,
                              training=False)
        return bundle.predict_view(outputs)

    return jax.jit(step)
