"""Backbone registry: name -> (module factory, stage channels).

Mirrors the selectable encoder zoo of the reference
(``model/EMIP_short/create_backbone.py:78-163`` dispatching into ``lib/``):
PVTv2 variants, PVT-v1, Res2Net-50 v1b, EfficientNet-B1/B4. Every backbone
returns NHWC stage features; the segmentation stream consumes the last three
stages (/8, /16, /32).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from emip_tpu.models.pvt_v2 import PVT_V2_VARIANTS, PVTv2

_REGISTRY: dict[str, Callable] = {}


def register_backbone(name: str, factory: Callable, stage_channels):
    _REGISTRY[name] = (factory, tuple(stage_channels))


def create_backbone(name: str, dtype=jnp.float32):
    """Returns (module, stage_channels) for ``name``.

    The module's __call__(x, train) must return a tuple of stage features;
    the last three are used at /8, /16, /32 resolution.
    """
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown backbone '{name}'; available: {sorted(_REGISTRY)}"
        )
    factory, channels = _REGISTRY[name]
    return factory(dtype=dtype), channels


def available_backbones():
    return sorted(_REGISTRY)


def _register_pvt_v2():
    for name, cfg in PVT_V2_VARIANTS.items():
        register_backbone(
            name,
            lambda dtype, _cfg=cfg: PVTv2(config=_cfg, dtype=dtype),
            cfg.embed_dims,
        )


_register_pvt_v2()


def _register_extras():
    # registered lazily to avoid import cycles; safe no-ops if absent
    try:
        from emip_tpu.models.pvt_v1 import PVT_V1_VARIANTS, PVTv1

        for name, cfg in PVT_V1_VARIANTS.items():
            register_backbone(
                name,
                lambda dtype, _cfg=cfg: PVTv1(config=_cfg, dtype=dtype),
                cfg.embed_dims,
            )
    except ImportError:
        pass
    try:
        from emip_tpu.models.res2net import Res2Net50V1b

        register_backbone(
            "res2net50_26w_4s",
            lambda dtype: Res2Net50V1b(dtype=dtype),
            (256, 512, 1024, 2048),
        )
    except ImportError:
        pass
    try:
        from emip_tpu.models.efficientnet import EfficientNetBackbone

        for name in ("efficientnet_b1", "efficientnet_b4"):
            register_backbone(
                name,
                lambda dtype, _n=name: EfficientNetBackbone(variant=_n, dtype=dtype),
                EfficientNetBackbone.stage_channels(name),
            )
    except ImportError:
        pass


_register_extras()
