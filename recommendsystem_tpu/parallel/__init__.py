"""parallel — distribution namespace: mesh construction, shardings, and the
all-to-all embedding exchange (facade over ``core.mesh`` and the sharded
lookup in ``embedding.engine``)."""

from ..core.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    data_sharding,
    distributed_init,
    local_mesh,
    process_count,
    process_index,
    replicated,
    row_sharding,
)
from ..embedding.engine import all_to_all_lookup  # noqa: F401
from ..train.state import state_shardings  # noqa: F401
