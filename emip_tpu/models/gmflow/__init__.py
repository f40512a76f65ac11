from emip_tpu.models.gmflow.encoder import CNNEncoder
from emip_tpu.models.gmflow.matching import (
    global_correlation_softmax,
    local_correlation_softmax,
)
from emip_tpu.models.gmflow.transformer import (
    FeatureTransformer,
    FeatureFlowAttention,
)
from emip_tpu.models.gmflow.gmflow import GMFlow, GMFlowConfig
