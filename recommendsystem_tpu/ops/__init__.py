"""ops — compute-op namespace: the canonical layer library plus the Pallas
TPU kernels behind it (facade over ``nn/`` and ``kernels/``)."""

from ..nn import *  # noqa: F401,F403
from ..kernels import (  # noqa: F401
    din_pool,
    interacting_attention,
    interpret_mode,
    set_backend,
    use_pallas,
)
