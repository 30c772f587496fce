"""Stacked (vmapped) MMoE for expert parallelism.

``nn/moe.py``'s MMOE builds one DNN per expert (faithful to
``rough_rank/layer.py:120-171``); this variant stacks the expert parameters
on a leading axis via ``nn.vmap`` so they form single ``(E, in, out)``
arrays.  Two payoffs on TPU:

- one batched einsum instead of E small matmuls (MXU-friendly), and
- the expert axis is shardable over the mesh's ``model`` axis
  (``expert_shardings``) — expert parallelism, the optional scale-out
  placement SURVEY §7 reserves for MMoE/PLE if ever scaled.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import MODEL_AXIS
from .mlp import DNN


class MMOEStacked(nn.Module):
    """Same math as ``nn.MMOE`` with experts stacked on a leading axis."""

    num_tasks: int
    num_experts: int = 2
    expert_dnn_units: Sequence[int] = (32,)
    gate_dnn_units: Sequence[int] = ()
    expert_dnn_params: Optional[Dict[str, Any]] = None
    gate_dnn_params: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, inputs, training: bool = False) -> List[jnp.ndarray]:
        expert_params = dict(self.expert_dnn_params or {})
        gate_params = {"output_activation": "softmax"}
        gate_params.update(self.gate_dnn_params or {})
        gate_units = list(self.gate_dnn_units) + [self.num_experts]

        ExpertStack = nn.vmap(
            DNN,
            in_axes=(None, None), out_axes=0,    # broadcast input+flag, stack outputs
            axis_size=self.num_experts,
            variable_axes={"params": 0, "losses": 0},
            split_rngs={"params": True, "dropout": True},
        )
        # training passed positionally: flax vmap drops kwargs
        expert_outs = ExpertStack(self.expert_dnn_units, name="experts",
                                  **expert_params)(inputs, training)
        experts = jnp.transpose(expert_outs, (1, 0, 2))   # (B, E, D)

        task_outs = []
        for i in range(self.num_tasks):
            gate = DNN(gate_units, name=f"task{i}_gate", **gate_params)(
                inputs, training=training)
            task_outs.append(jnp.einsum("bed,be->bd", experts, gate,
                                        preferred_element_type=jnp.float32))
        return task_outs


class PLEStacked(nn.Module):
    """Stacked-expert PLE (same math as ``nn.PLE``): shared experts in one
    (S, ...) stack, task-specific experts in one (T·Sp, ...) stack."""

    num_tasks: int
    num_shared_experts: int = 2
    num_specific_experts: int = 2
    expert_dnn_units: Sequence[int] = (32,)
    gate_dnn_units: Sequence[int] = ()
    expert_dnn_params: Optional[Dict[str, Any]] = None
    gate_dnn_params: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, inputs, training: bool = False) -> List[jnp.ndarray]:
        expert_params = dict(self.expert_dnn_params or {})
        gate_params = {"output_activation": "softmax"}
        gate_params.update(self.gate_dnn_params or {})
        n_per_task = self.num_shared_experts + self.num_specific_experts
        gate_units = list(self.gate_dnn_units) + [n_per_task]

        def stack(size, name):
            Stack = nn.vmap(DNN, in_axes=(None, None), out_axes=0,
                            axis_size=size,
                            variable_axes={"params": 0, "losses": 0},
                            split_rngs={"params": True, "dropout": True})
            return Stack(self.expert_dnn_units, name=name, **expert_params)

        shared = stack(self.num_shared_experts, "experts")(inputs, training)
        shared = jnp.transpose(shared, (1, 0, 2))               # (B, S, D)
        specific = stack(self.num_tasks * self.num_specific_experts,
                         "specific_experts")(inputs, training)
        specific = jnp.transpose(specific, (1, 0, 2))           # (B, T*Sp, D)

        task_outs = []
        for i in range(self.num_tasks):
            mine = specific[:, i * self.num_specific_experts:
                            (i + 1) * self.num_specific_experts]
            experts = jnp.concatenate([shared, mine], axis=1)   # (B, S+Sp, D)
            gate = DNN(gate_units, name=f"task{i}_gate", **gate_params)(
                inputs, training=training)
            task_outs.append(jnp.einsum("bed,be->bd", experts, gate,
                                        preferred_element_type=jnp.float32))
        return task_outs


class GatedExpert(nn.Module):
    """One MMoE expert with per-layer 2*sigmoid gates over a separate gate
    input — the expert shape shared by the ctr production ranker
    (``rank/ctr/model_init.py:101-118``) and staytime
    (``staytime/VideoDnn.py:129-151``).  Factored out so those models'
    ``stacked_experts`` option can ``nn.vmap`` it into one (E, ...) param
    stack shardable over the model mesh axis."""

    hidden: Tuple[int, ...]

    @nn.compact
    def __call__(self, expert_in, gate_input):
        from .mlp import Dense
        expert = expert_in
        for j, unit in enumerate(self.hidden):
            g = Dense(unit, activation="relu", name=f"gate_{j}_1")(gate_input)
            g = 2 * Dense(unit, activation="sigmoid", name=f"gate_{j}_2")(g)
            expert = Dense(unit, activation="relu",
                           name=f"expert_output_{j}")(expert)
            expert = g * expert
        return expert


def stacked_gated_experts(num_experts: int, hidden, expert_in, gate_input,
                          name: str = "experts"):
    """(B, D_in) x (B, G) -> (B, E, D_out) with expert params stacked on a
    leading axis (one batched einsum per layer instead of E small matmuls)."""
    Stack = nn.vmap(GatedExpert, in_axes=(None, None), out_axes=0,
                    axis_size=num_experts,
                    variable_axes={"params": 0, "losses": 0},
                    split_rngs={"params": True})
    stacked = Stack(tuple(hidden), name=name)(expert_in, gate_input)
    return jnp.transpose(stacked, (1, 0, 2))


def expert_shardings(params, mesh: Mesh, axis: str = MODEL_AXIS):
    """Sharding tree for an MMOEStacked param subtree: stacked expert leaves
    (leading axis == num_experts) shard over ``axis``; everything else
    replicates.  Merge into a full state-sharding tree with jax.tree.map."""
    repl = NamedSharding(mesh, P())

    def leaf(x):
        if getattr(x, "ndim", 0) >= 2:
            return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return repl

    def walk(tree, inside_experts=False):
        if isinstance(tree, dict):
            return {k: walk(v, inside_experts or
                            k in ("experts", "specific_experts"))
                    for k, v in tree.items()}
        return leaf(tree) if inside_experts else repl

    return walk(params)
