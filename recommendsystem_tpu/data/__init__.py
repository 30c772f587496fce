from .staytime_labels import staytime_labels, BIN_LIST  # noqa: F401
from .synthetic import synthetic_batch  # noqa: F401
