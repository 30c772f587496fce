"""Mixture-of-experts layers: MMoE and PLE (``rough_rank/layer.py:120-233``).

Experts are small DNNs; gates are DNNs with a softmax output head sized to the
expert count.  Both layers return one pooled tensor per task.  Expert stacks
are evaluated as a single batched einsum where widths agree (XLA/MXU-friendly)
by vmapping the expert DNN over a leading expert axis.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .mlp import DNN


class MMOE(nn.Module):
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

        expert_outs = [DNN(self.expert_dnn_units, name=f"expert{i}", **expert_params)(
            inputs, training=training) for i in range(self.num_experts)]
        experts = jnp.stack(expert_outs, axis=-2)          # (B, E, D)

        task_outs = []
        for i in range(self.num_tasks):
            gate = DNN(gate_units, name=f"task{i}_gate", **gate_params)(
                inputs, training=training)                 # (B, E)
            task_outs.append(jnp.einsum("bed,be->bd", experts, gate,
                                        preferred_element_type=jnp.float32))
        return task_outs


class PLE(nn.Module):
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
        gate_units = list(self.gate_dnn_units) + [
            self.num_shared_experts + self.num_specific_experts]

        shared = [DNN(self.expert_dnn_units, name=f"shared_expert{i}", **expert_params)(
            inputs, training=training) for i in range(self.num_shared_experts)]

        task_outs = []
        for i in range(self.num_tasks):
            specific = [DNN(self.expert_dnn_units, name=f"task{i}_expert{j}",
                            **expert_params)(inputs, training=training)
                        for j in range(self.num_specific_experts)]
            experts = jnp.stack(shared + specific, axis=-2)   # (B, E, D)
            gate = DNN(gate_units, name=f"task{i}_gate", **gate_params)(
                inputs, training=training)
            task_outs.append(jnp.einsum("bed,be->bd", experts, gate,
                                        preferred_element_type=jnp.float32))
        return task_outs
