"""Machinery for instantiating reference torch modules as parity oracles.

The reference ships with broken/absent dependencies (SURVEY.md §7.1):
``PromptInteract.py`` imports the stale ``model.EPFlow_1_feature`` package,
and ``lib/pvt_v2.py`` imports timm/mmcv/mmdet which are not in this
environment. This module installs minimal stand-ins for those imports so the
*reference's own code* can run on CPU as a numerical oracle. The stand-ins
only cover symbols the reference touches on the live path (DropPath is a
faithful stochastic-depth implementation; registries are no-op decorators).
"""

from __future__ import annotations

import importlib
import os
import sys
import types

REF = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REF, "model"))


def install_stubs() -> None:
    """Install timm/mmcv/mmdet stand-ins into sys.modules (idempotent)."""
    if "timm" in sys.modules:
        return

    import torch
    import torch.nn as nn

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    class DropPath(nn.Module):
        """Per-sample stochastic depth (timm semantics)."""

        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(
                keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            )
            return x.div(keep) * mask

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    vit = types.ModuleType("timm.models.vision_transformer")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    registry.register_model = lambda fn: fn
    vit._cfg = lambda url="", **kw: dict(url=url, **kw)

    def _no_create_model(*a, **k):
        raise RuntimeError("timm.create_model stub: not available in tests")

    models.create_model = _no_create_model
    models.layers = layers
    models.registry = registry
    models.vision_transformer = vit
    timm.models = models
    for name, mod in {
        "timm": timm,
        "timm.models": models,
        "timm.models.layers": layers,
        "timm.models.registry": registry,
        "timm.models.vision_transformer": vit,
    }.items():
        sys.modules[name] = mod

    import logging

    class _Registry:
        def register_module(self, *a, **k):
            return lambda cls: cls

    mmdet = types.ModuleType("mmdet")
    mmdet_models = types.ModuleType("mmdet.models")
    mmdet_builder = types.ModuleType("mmdet.models.builder")
    mmdet_utils = types.ModuleType("mmdet.utils")
    mmdet_builder.BACKBONES = _Registry()
    mmdet_utils.get_root_logger = lambda *a, **k: logging.getLogger("mmdet")
    mmdet_models.builder = mmdet_builder
    mmdet.models = mmdet_models
    mmdet.utils = mmdet_utils

    mmcv = types.ModuleType("mmcv")
    mmcv_runner = types.ModuleType("mmcv.runner")

    def _no_load_checkpoint(*a, **k):
        raise RuntimeError("mmcv load_checkpoint stub: no pretrained loads")

    mmcv_runner.load_checkpoint = _no_load_checkpoint
    mmcv.runner = mmcv_runner

    # torchvision: EMIP_long/{LTM,helpers}.py import `models` but never use
    # it on the live path (the STM encoder they'd back is commented out)
    torchvision = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    torchvision.models = tv_models
    for name, mod in {
        "mmdet": mmdet,
        "mmdet.models": mmdet_models,
        "mmdet.models.builder": mmdet_builder,
        "mmdet.utils": mmdet_utils,
        "mmcv": mmcv,
        "mmcv.runner": mmcv_runner,
        "torchvision": torchvision,
        "torchvision.models": tv_models,
    }.items():
        sys.modules[name] = mod


def import_reference(module: str):
    """Import a reference module with stubs + EPFlow path aliases installed."""
    install_stubs()
    sys.path.insert(0, REF)
    try:
        # alias the stale package names to the real modules (SURVEY §7.1)
        stub_root = "model.EPFlow_1_feature"
        if stub_root not in sys.modules:
            common = importlib.import_module("model.EMIP_short.motion.common")
            transformer = importlib.import_module(
                "model.EMIP_short.motion.transformer"
            )
            for name, mod in {
                stub_root: importlib.import_module("model.EMIP_short"),
                stub_root + ".motion": importlib.import_module(
                    "model.EMIP_short.motion"
                ),
                stub_root + ".motion.common": common,
                stub_root + ".motion.transformer": transformer,
            }.items():
                sys.modules.setdefault(name, mod)
        return importlib.import_module(module)
    finally:
        sys.path.pop(0)


def reference_model_args(depths=(3, 6, 40, 3)) -> dict:
    """The reference configs.yaml ``model.args`` block (configs.yaml:24-60)."""
    return {
        "inp_size": 352,
        "iters": 2,
        "corr_levels": 4,
        "corr_radius": 4,
        "test_mode": False,
        "channel": 32,
        "backbone_name": "pvt_v2_b5",
        "in_channel_list": [128, 320, 512],
        "hidden_dim": 128,
        "context_dim": 128,
        "GMFlow": {
            "padding_factor": 16,
            "upsample_factor": 8,
            "attn_splits_list": [2],
            "corr_radius_list": [-1],
            "prop_radius_list": [-1],
            "num_scales": 1,
            "num_head": 1,
            "attention_type": "swin",
            "ffn_dim_expansion": 4,
            "num_transformer_layers": 6,
            "feature_channels": 128,
            "pred_bidir_flow": True,
        },
    }


def make_reduced_b5_factory(depths):
    """A pvt_v2_b5 stand-in with real channels but reduced depths.

    Keeps every glue shape of the assembled model real (128/320/512 stage
    channels, 1936-ch correlation volume, 128-d injectors) while making a
    CPU oracle forward tractable. Patch over ``lib.pvt_v2.pvt_v2_b5`` before
    constructing the reference CoUpdater.
    """
    from functools import partial

    import torch.nn as nn

    pvt_v2 = import_reference("lib.pvt_v2")

    def factory(pretrained=None, **kwargs):
        return pvt_v2.PyramidVisionTransformerV2(
            patch_size=4,
            embed_dims=[64, 128, 320, 512],
            num_heads=[1, 2, 5, 8],
            mlp_ratios=[4, 4, 4, 4],
            qkv_bias=True,
            norm_layer=partial(nn.LayerNorm, eps=1e-6),
            depths=list(depths),
            sr_ratios=[8, 4, 2, 1],
            drop_rate=0.0,
            drop_path_rate=0.1,
            pretrained=pretrained,
        )

    return pvt_v2, factory
