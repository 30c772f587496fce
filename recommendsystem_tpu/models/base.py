"""Model bundle contract — the platform interface the reference implies.

Every reference workload exposes a fixed-signature factory
``create_model_func()`` returning ``{train, predict}`` models with compiled
losses/metrics (``rank/multi_head/model.py:36-41``, ``rank/finish/
model.py:27-32``, ``staytime/model.py:63-67``).  Here a factory returns one
``ModelBundle``: a flax dense tower ("sub_model"), the embedding engine that
feeds it ("full_model" minus sub_model), and the training assembly (losses,
loss_weights, metrics, dense optimizer) — everything ``train/step.py`` needs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import optax

from ..embedding.engine import EmbeddingFeatures, IdBatch


@dataclasses.dataclass
class ModelBundle:
    name: str
    module: Any                                  # flax module: (embs, training=...) -> Dict[task, out]
    embedding: EmbeddingFeatures
    losses: Dict[str, Callable]
    metrics: Dict[str, List]
    dense_optimizer: optax.GradientTransformation
    loss_weights: Optional[Dict[str, float]] = None
    # tasks whose outputs differ between train and predict graphs
    # (staytime: train emits concat(dist, EV), predict emits EV —
    #  ``staytime/VideoDnn.py:194-210``)
    predict_outputs: Optional[Dict[str, str]] = None
    # batch column keys the model consumes (embedding columns + dense)
    dense_input_keys: tuple = ()
    config: Any = None
    # mixed-precision policy: None = fp32 throughout; jnp.bfloat16 casts
    # params + embedding activations at use inside the step (master weights,
    # losses, metrics, optimizer state stay fp32) — see train/step.py
    compute_dtype: Any = None

    def init(self, rng, batch: Dict[str, IdBatch], dense_inputs=None):
        """Initialize dense params + embedding tables.  The module init runs
        under jit: param shapes only depend on input SHAPES, and eager init
        would materialize every intermediate of the forward trace (at
        production widths the attention broadcast alone OOMs eagerly; under
        jit XLA fuses it away)."""
        rng_t, rng_p, rng_d = jax.random.split(rng, 3)
        tables = self.embedding.init(rng_t)
        embs = self.embedding.lookup(self.embedding.weights(tables), batch)
        kwargs = {}
        if dense_inputs is not None:
            kwargs["dense_inputs"] = dense_inputs

        def init_fn(rp, rd, embs_, kw):
            return self.module.init({"params": rp, "dropout": rd},
                                    embs_, training=False, **kw)

        variables = jax.jit(init_fn)(rng_p, rng_d, embs, kwargs)
        return variables, tables

    def forward(self, variables, table_weights, batch, training=False,
                rngs=None, dense_inputs=None, mode: str = "local",
                mutable=False):
        embs = self.embedding.lookup(table_weights, batch, mode=mode)
        kwargs = {}
        if dense_inputs is not None:
            kwargs["dense_inputs"] = dense_inputs
        return self.module.apply(variables, embs, training=training,
                                 rngs=rngs, mutable=mutable, **kwargs)

    def predict_view(self, outputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Map a full output dict to the online-serving outputs."""
        if not self.predict_outputs:
            return {t: outputs[t] for t in self.losses}
        return {task: outputs[src] for task, src in self.predict_outputs.items()}


MODEL_REGISTRY: Dict[str, Callable[..., ModelBundle]] = {}


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco


def create_model(name: str, **kwargs) -> ModelBundle:
    return MODEL_REGISTRY[name](**kwargs)
