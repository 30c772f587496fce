"""Serving export — the L6 serving contract (SURVEY §1).

The reference serves named output tensors from a "sub_model" dense graph
(``tf.identity(output, name=...)`` — ``autoint:54``, ``staytime/
VideoDnn.py:194-210``).  Here the whole predict function (embedding lookup +
dense tower + predict-view renaming) exports as a versioned StableHLO
artifact via ``jax.export`` — loadable by any PJRT runtime without Python
model code — alongside an orbax checkpoint of the weights.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..embedding.engine import IdBatch
from ..models.base import ModelBundle
from .state import TrainState

# jax.export needs explicit serialization registration for custom pytrees
try:
    jax_export.register_pytree_node_serialization(
        IdBatch,
        serialized_name="recommendsystem_tpu.IdBatch",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda b: None,
        from_children=lambda aux, children: IdBatch(*children),
    )
except ValueError:
    pass   # already registered


def _abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype), tree)


def make_serving_fn(bundle: ModelBundle):
    """(weights, batch, dense_inputs) -> named predict outputs."""

    def serve(weights, params, batch, dense_inputs):
        from .step import apply_model
        embs = bundle.embedding.lookup(weights, batch)
        outputs = apply_model(bundle, params, embs, dense_inputs,
                              training=False)
        return bundle.predict_view(outputs)

    return serve


def export_serving(bundle: ModelBundle, state: TrainState,
                   batch: Dict[str, IdBatch], dense_inputs=None,
                   path: Optional[str] = None) -> bytes:
    """Serialize the predict function at the example batch's shapes.

    Returns the serialized artifact; with ``path`` also writes
    ``<path>/model.stablehlo`` + ``<path>/signature.json``.
    """
    serve = make_serving_fn(bundle)
    weights = bundle.embedding.weights(state.tables)
    args = (weights, state.params, batch, dense_inputs)
    exported = jax_export.export(jax.jit(serve))(*_abstract(args))
    blob = exported.serialize()
    if path:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "model.stablehlo"), "wb") as f:
            f.write(blob)
        sig = {
            "model": bundle.name,
            "outputs": sorted(bundle.predict_view(
                {t: None for t in bundle.losses} if not bundle.predict_outputs
                else {src: None for src in bundle.predict_outputs.values()}).keys()),
            "batch_columns": {k: list(v.rows.shape) for k, v in batch.items()},
        }
        with open(os.path.join(path, "signature.json"), "w") as f:
            json.dump(sig, f, indent=2)
    return blob


def load_serving(blob: bytes):
    """Rehydrate an exported artifact; returns a callable
    (weights, params, batch, dense_inputs) -> outputs."""
    exported = jax_export.deserialize(blob)
    return exported.call
