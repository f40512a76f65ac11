from emip_tpu.utils.config import load_config, Config
from emip_tpu.utils.logging import ScalarLogger, setup_logging
from emip_tpu.utils.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint_step,
)
