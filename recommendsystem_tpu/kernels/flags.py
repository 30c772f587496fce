"""Kernel dispatch flags.

Pallas kernels are opt-in per op (SURVEY §7 step 5: "swap into nn/ behind
flags; benchmark vs XLA-fused baseline").  Benchmarked on v5e (B=4096, F=24,
D=8, T=50): the fused interacting kernel ran 5.2 ms vs 0.9 ms XLA and the
DIN kernel 1.3 ms vs 0.9 ms — at these tiny feature dims the (8,128)-lane
padding inflates VMEM traffic and XLA's layout freedom wins, so the AUTO
default is XLA.  Force Pallas with ``RECSYS_TPU_KERNELS=pallas`` or
``set_backend("pallas")`` (e.g. for larger emb dims / field counts where the
fusion pays for itself).
"""

from __future__ import annotations

import os

import jax

_FORCED: str | None = None


def set_backend(name: str | None) -> None:
    """name in {'pallas', 'xla', None} (None = auto)."""
    global _FORCED
    if name not in (None, "pallas", "xla"):
        raise ValueError(name)
    _FORCED = name


def use_pallas() -> bool:
    forced = _FORCED or os.environ.get("RECSYS_TPU_KERNELS")
    if forced == "pallas":
        return True
    return False


def use_flash() -> bool:
    """Flash-style field attention (``field_attention_pallas``) is ON by
    default on TPU: unlike the opt-in fused kernels above it reduces HBM
    traffic asymptotically (F²·B score tensors never materialize — 2 GB
    each at production F=175, ~100 ms/step in the round-5 trace), not just
    fusion overhead.  ``set_backend("xla")`` or RECSYS_TPU_FLASH=0 disables."""
    if (_FORCED or os.environ.get("RECSYS_TPU_KERNELS")) == "xla":
        return False
    if os.environ.get("RECSYS_TPU_FLASH", "1") == "0":
        return False
    return jax.default_backend() in ("tpu", "axon")


def interpret_mode() -> bool:
    """Pallas interpret mode for non-TPU backends (tests on CPU)."""
    return jax.default_backend() not in ("tpu", "axon")
