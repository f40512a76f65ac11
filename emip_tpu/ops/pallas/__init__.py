from emip_tpu.ops.pallas.corr_softmax import (
    softmax_expectation,
    fused_flow_attention,
)
