"""Train state: dense params + optimizer state + sparse tables + step.

The TPU-native replacement for ``tn.model.Model`` + ``tn.optimizer.Optimizer``
(``rank/ctr/base_model.py:172-196``): a pure pytree that jit-compiled step
functions thread through, with dense state replicated over the mesh and
sparse tables row-sharded (SURVEY §2.8 parallelism table).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from ..models.base import ModelBundle


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    tables: Dict[str, Dict[str, Any]]
    step: Any


def create_train_state(bundle: ModelBundle, rng, batch, dense_inputs=None
                       ) -> TrainState:
    variables, tables = bundle.init(rng, batch, dense_inputs=dense_inputs)
    params = variables["params"]
    opt_state = bundle.dense_optimizer.init(params)
    import jax.numpy as jnp
    return TrainState(params=params, opt_state=opt_state, tables=tables,
                      step=jnp.zeros((), jnp.int32))


def state_shardings(bundle: ModelBundle, state: TrainState, mesh: Mesh,
                    tensor_parallel: bool = False,
                    tp_min_dim: int = 64) -> TrainState:
    """Dense state replicated; tables (and their per-row opt state / show
    counters) row-sharded over the data axis.

    ``tensor_parallel=True`` additionally shards large dense kernels
    column-wise over ``MODEL_AXIS`` (2-D weights whose output dim is a
    multiple of the model-axis size and >= ``tp_min_dim``); XLA propagates
    the matching activation shardings and inserts the collectives — the
    reference has no dense-TP (SURVEY §2.8 "Absent"), this is the scale-out
    path beyond it.
    """
    from ..core.mesh import MODEL_AXIS

    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(DATA_AXIS, None))
    tp_size = mesh.shape.get(MODEL_AXIS, 1)

    def param_shard(x):
        if (tensor_parallel and tp_size > 1 and getattr(x, "ndim", 0) == 2
                and x.shape[-1] >= tp_min_dim and x.shape[-1] % tp_size == 0):
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        return repl

    def table_shard(x):
        return row if getattr(x, "ndim", 0) == 2 else repl

    params_sh = jax.tree.map(param_shard, state.params)
    # optax state mirrors the param tree (e.g. Adam mu/nu) — give matching
    # shardings where shapes line up, else replicate
    def opt_shard(x):
        return param_shard(x)

    return TrainState(
        params=params_sh,
        opt_state=jax.tree.map(opt_shard, state.opt_state),
        tables=jax.tree.map(table_shard, state.tables),
        step=repl,
    )
