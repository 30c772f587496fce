"""PPNet-style personalized gating towers.

All three reference gate flavours share one shape — a tower over the bias/gate
embeddings ending in ``scale * sigmoid``:

- ctr:      single Dense -> 2*sigmoid, split into per-layer gates
            (``rank/ctr/model_init.py:63-68``);
- staytime: Dense(unit, relu) -> Dense(unit, sigmoid) * 2 per expert layer
            (``staytime/VideoDnn.py:135-146``);
- finish:   Dense(prev, relu) -> Dense(prev, sigmoid) * 2 multiplied into the
            hidden activations (``rank/finish/videodnn.py:107-133``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn

from .mlp import Dense


class GateTower(nn.Module):
    """Optional hidden relu layer then ``scale * sigmoid`` gate."""

    out_units: int
    hidden_units: Optional[int] = None
    scale: float = 2.0
    kernel_regularizer: Optional[Tuple[float, float]] = None

    @nn.compact
    def __call__(self, gate_input):
        x = gate_input
        if self.hidden_units is not None:
            x = Dense(self.hidden_units, activation="relu", name="gate_hidden",
                      kernel_regularizer=self.kernel_regularizer)(x)
        x = Dense(self.out_units, activation="sigmoid", name="gate_out",
                  kernel_regularizer=self.kernel_regularizer)(x)
        return self.scale * x


class PPNetGateBank(nn.Module):
    """ctr variant: ONE Dense produces every gate, split by ``splits``
    (``model_init.py:66-68`` with splits [256,64,8,256,64,8,32,16])."""

    splits: Sequence[int]
    scale: float = 2.0

    @nn.compact
    def __call__(self, gate_input):
        total = sum(self.splits)
        gates = self.scale * Dense(total, activation="sigmoid",
                                   name="dnn_ppnet_gate")(gate_input)
        out, start = [], 0
        for s in self.splits:
            out.append(gates[:, start:start + s])
            start += s
        return out
