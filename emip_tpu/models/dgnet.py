"""DGNet: gradient-induced camouflaged-object detector (catalogued extra).

Re-design of ``lib/DGNet.py`` — present in the reference tree but never
imported by any entry point (SURVEY.md §2.2); provided for completeness of
the model zoo. An EfficientNet context encoder and a small texture encoder
meet through the gradient-induced transition (channel-interleaved grouping
+ soft grouping convs), decoded by the NCD.

TPU-first notes: the reference's M-way chunk/concat interleaving
(lib/DGNet.py:83-122, a 40-line unrolled switch) is one reshape/stack —
channels [C] and [G] interleave as [M, C/M] x [M, G/M] -> [M, (C+G)/M];
grouped 1x1 convs map to ``feature_group_count``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from emip_tpu.models.backbones import create_backbone
from emip_tpu.models.common import (
    ConvBR,
    DimensionalReduction,
    NeighborConnectionDecoder,
)
from emip_tpu.ops.image import resize_bilinear

Dtype = Any


def interleave_groups(xr: jnp.ndarray, xg: jnp.ndarray, m: int) -> jnp.ndarray:
    """Channel-interleave two NHWC maps in M groups.

    Equivalent to the reference's chunk/cat ladder: the result's channel
    axis is [xr_g0, xg_g0, xr_g1, xg_g1, ...].
    """
    b, h, w, c = xr.shape
    g = xg.shape[-1]
    assert c % m == 0 and g % m == 0
    xr_g = xr.reshape(b, h, w, m, c // m)
    xg_g = xg.reshape(b, h, w, m, g // m)
    return jnp.concatenate([xr_g, xg_g], axis=-1).reshape(b, h, w, c + g)


class SoftGroupingStrategy(nn.Module):
    """Sum of three grouped 1x1 convs with different group counts."""

    features: int
    groups: tuple[int, int, int] = (4, 8, 16)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q):
        out = 0.0
        for i, g in enumerate(self.groups):
            out = out + nn.Conv(
                self.features, (1, 1), feature_group_count=g, use_bias=False,
                dtype=self.dtype, name=f"g_conv{i + 1}",
            )(q)
        return out


class GradientInducedTransition(nn.Module):
    channel: int = 32
    m: tuple[int, int, int] = (8, 8, 8)
    groups: tuple[int, int, int] = (4, 8, 16)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xr3, xr4, xr5, xg, train: bool = False):
        _, h, w, _ = xg.shape
        xg2 = resize_bilinear(xg, (h // 2, w // 2), align_corners=True)
        xg4 = resize_bilinear(xg, (h // 4, w // 4), align_corners=True)

        outs = []
        for i, (xr, g) in enumerate(((xr3, xg), (xr4, xg2), (xr5, xg4))):
            q = interleave_groups(xr, g, self.m[i])
            outs.append(
                xr + SoftGroupingStrategy(
                    self.channel, self.groups, dtype=self.dtype,
                    name=f"sgs{i + 3}",
                )(q)
            )
        return tuple(outs)


class TextureEncoder(nn.Module):
    """Shallow spatial/texture path: 3 strided ConvBRs to /8, 32-ch."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = ConvBR(64, 7, stride=2, padding=3, dtype=self.dtype,
                   name="conv1")(x, train)
        f = ConvBR(64, 3, stride=2, padding=1, dtype=self.dtype,
                   name="conv2")(f, train)
        xg = ConvBR(32, 3, stride=2, padding=1, dtype=self.dtype,
                    name="conv3")(f, train)
        pg = ConvBR(1, 1, dtype=self.dtype, name="conv_out")(xg, train)
        return xg, pg


class DGNet(nn.Module):
    channel: int = 32
    arc: str = "efficientnet_b4"
    m: tuple[int, int, int] = (8, 8, 8)
    groups: tuple[int, int, int] = (4, 8, 16)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        encoder, stage_channels = create_backbone(self.arc, self.dtype)
        stages = encoder(x, train=train)
        # reductions 3/4/5 = /8, /16, /32
        x3, x4, x5 = stages[-3], stages[-2], stages[-1]

        xr3 = DimensionalReduction(self.channel, dtype=self.dtype,
                                   name="dr3")(x3, train)
        xr4 = DimensionalReduction(self.channel, dtype=self.dtype,
                                   name="dr4")(x4, train)
        xr5 = DimensionalReduction(self.channel, dtype=self.dtype,
                                   name="dr5")(x5, train)

        xg, pg = TextureEncoder(dtype=self.dtype, name="texture")(x, train)

        zt3, zt4, zt5 = GradientInducedTransition(
            self.channel, self.m, self.groups, dtype=self.dtype, name="git",
        )(xr3, xr4, xr5, xg, train)

        pc = NeighborConnectionDecoder(self.channel, final_upsample=False,
                                       dtype=self.dtype, name="ncd")(
            zt5, zt4, zt3, train
        )
        _, hh, ww, _ = pg.shape
        pc_up = resize_bilinear(pc.astype(jnp.float32), (8 * hh, 8 * ww),
                                align_corners=True)
        pg_up = resize_bilinear(pg.astype(jnp.float32), (8 * hh, 8 * ww),
                                align_corners=True)
        return pc_up, pg_up
