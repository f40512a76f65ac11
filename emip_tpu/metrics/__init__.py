from emip_tpu.metrics.metrics import (
    MAE,
    Dice,
    Emeasure,
    Fmeasure,
    IoU,
    Smeasure,
    WeightedFmeasure,
    prepare_pred_gt,
)
