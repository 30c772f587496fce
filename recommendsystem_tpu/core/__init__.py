from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    local_mesh,
    process_count,
    process_index,
)
from .config import (  # noqa: F401
    FeatureConfig,
    ModelConfig,
    SlotIntervals,
    load_model_parameter_json,
)
