from emip_tpu.metrics.metrics import (
    MAE,
    Dice,
    Emeasure,
    Fmeasure,
    IoU,
    Medical,
    Smeasure,
    WeightedFmeasure,
    prepare_pred_gt,
)
