from emip_tpu.convert.torch_import import (
    convert_gmflow_state,
    convert_pvt_v2_state,
    convert_emip_short_state,
    maybe_load_reference_weights,
)
