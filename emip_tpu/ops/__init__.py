from emip_tpu.ops.image import (
    resize_bilinear,
    resize_area,
    resize_nearest,
    normalize_imagenet,
)
from emip_tpu.ops.geometry import (
    coords_grid,
    bilinear_sample,
    flow_warp,
    forward_backward_consistency,
)
from emip_tpu.ops.warp import (
    flow_warp_loss,
    occlusion_mask_backward,
    occlusion_mask_bidirection,
    forward_splat_density,
)
from emip_tpu.ops.window import (
    window_split,
    window_merge,
    shifted_window_mask,
)
from emip_tpu.ops.position import sine_position_embedding
from emip_tpu.ops.upsample import convex_upsample, upsample_flow_bilinear
