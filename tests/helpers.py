"""Shared tiny model configs for fast CPU tests."""

from emip_tpu.models.emip_short import EMIPShortConfig
from emip_tpu.models.gmflow import GMFlowConfig
from emip_tpu.models.pvt_v2 import PVTv2Config

TINY_PVT = PVTv2Config(
    embed_dims=(16, 32, 48, 64),
    num_heads=(1, 2, 3, 4),
    mlp_ratios=(2, 2, 2, 2),
    depths=(1, 1, 2, 1),
    sr_ratios=(8, 4, 2, 1),
    drop_path_rate=0.1,
    remat=False,
)

TINY_GMFLOW = GMFlowConfig(
    num_scales=1,
    upsample_factor=8,
    feature_channels=32,
    num_transformer_layers=2,
    ffn_dim_expansion=2,
    attn_splits_list=(2,),
    corr_radius_list=(-1,),
    prop_radius_list=(-1,),
    pred_bidir_flow=True,
)


def tiny_short_config(inp_size: int = 64) -> EMIPShortConfig:
    from emip_tpu.models.backbones import register_backbone
    from emip_tpu.models.pvt_v2 import PVTv2

    register_backbone(
        "pvt_v2_tiny",
        lambda dtype: PVTv2(config=TINY_PVT, dtype=dtype),
        TINY_PVT.embed_dims,
    )
    return EMIPShortConfig(
        backbone_name="pvt_v2_tiny",
        channel=8,
        inp_size=inp_size,
        gmflow=TINY_GMFLOW,
        include_dead_modules=False,
    )
