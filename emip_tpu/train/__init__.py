from emip_tpu.train.state import (
    TrainState,
    build_optimizer,
    cosine_epoch_lr,
    partition_params,
    merge_params,
    GMFLOW_FREEZE,
)
from emip_tpu.train.short import make_short_train_step, make_short_eval_step
