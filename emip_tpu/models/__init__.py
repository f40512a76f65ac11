from emip_tpu.models.common import (
    ConvBR,
    BasicConv2d,
    DimensionalReduction,
    NeighborConnectionDecoder,
    LayerNorm2d,
)
from emip_tpu.models.prompt import Injector
from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig, SegNetwork
from emip_tpu.models.emip_long import EMIPLong, MemoryState
