from emip_tpu.losses.seg import hybrid_e_loss
from emip_tpu.losses.flow import UnsupFlowLossConfig, unsup_flow_loss, ssim_distance
