"""Pallas TPU kernels for the hot compute paths (SURVEY §7 kernels/)."""

from .flags import interpret_mode, set_backend, use_pallas  # noqa: F401
from .interacting_pallas import interacting_attention  # noqa: F401
from .din_pallas import din_pool  # noqa: F401
