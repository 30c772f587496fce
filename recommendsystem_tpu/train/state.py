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


def state_shardings(bundle: ModelBundle, state: TrainState, mesh: Mesh) -> TrainState:
    """Dense state replicated; tables (and their per-row opt state / show
    counters) row-sharded over the data axis."""
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(DATA_AXIS, None))

    def table_shard(x):
        return row if getattr(x, "ndim", 0) == 2 else repl

    return TrainState(
        params=jax.tree.map(lambda _: repl, state.params),
        opt_state=jax.tree.map(lambda _: repl, state.opt_state),
        tables=jax.tree.map(table_shard, state.tables),
        step=repl,
    )
