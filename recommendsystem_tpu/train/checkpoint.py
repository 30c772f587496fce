"""Checkpoint / resume for dense params + sharded sparse tables (orbax).

The reference delegates checkpointing to the platform (SURVEY §5: none
in-repo; ``trained_delta_days`` at ``rank/multi_head/model.py:9`` implies
day-incremental state).  Here it is first-class: the whole TrainState —
including per-row sparse optimizer state and show counters — round-trips
through orbax, restoring onto the same mesh shardings.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


def save_checkpoint(path: str, state: TrainState, step: Optional[int] = None,
                    force: bool = True) -> str:
    path = os.path.abspath(path)
    step = int(state.step) if step is None else step
    ckpt_path = os.path.join(path, str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_path, state, force=force)
    ckptr.wait_until_finished()
    return ckpt_path


def restore_checkpoint(path: str, target: TrainState,
                       step: Optional[int] = None) -> TrainState:
    path = os.path.abspath(path)
    if step is None:
        steps = sorted(int(d) for d in os.listdir(path) if d.isdigit())
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step = steps[-1]
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(os.path.join(path, str(step)), abstract)
