from . import losses  # noqa: F401
from . import metrics  # noqa: F401
from .state import TrainState, create_train_state, state_shardings  # noqa: F401
from .step import (make_eval_step, make_predict_step, make_scan_train_step,  # noqa: F401
                   make_train_step, total_loss_fn)
from .harness import dump_predict, evaluate, fit, predict  # noqa: F401
from .streaming_gauc import StreamingGauc, StreamingSpearmanGauc  # noqa: F401
from .gauc_eval import evaluate_gauc, evaluate_gauc_streaming, make_gauc_eval_step  # noqa: F401
from .checkpoint import restore_checkpoint, save_checkpoint  # noqa: F401
