"""Shared conv blocks and the neighbor-connection decoder (NCD).

flax.linen re-designs of the segmentation-stream building blocks
(reference: ``model/EMIP_short/create_backbone.py``): Conv+BN(+ReLU) blocks,
the SINet-V2-style neighbor-connection decoder, and dimensional reduction.
NHWC layout; BatchNorm carries running stats in the ``batch_stats``
collection (torch momentum 0.1 == flax momentum 0.9).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from emip_tpu.ops.image import resize_bilinear

Dtype = Any


class ConvBR(nn.Module):
    """3x3-style Conv (no bias) + BatchNorm + ReLU.

    (reference: create_backbone.py:22-42)
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=nn.initializers.kaiming_normal(),
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)


class BasicConv2d(nn.Module):
    """Conv (no bias) + BatchNorm, optional ReLU.

    The reference carries two same-named variants: ``create_backbone.py:7-19``
    (no relu on forward) and ``model.py:137-150`` (with relu); ``with_relu``
    selects between them.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    with_relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        if self.with_relu:
            x = nn.relu(x)
        return x


class DimensionalReduction(nn.Module):
    """Two stacked ConvBRs reducing channel width.

    (reference: create_backbone.py:199-208)
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBR(self.features, 3, padding=1, dtype=self.dtype, name="reduce0")(
            x, train
        )
        x = ConvBR(self.features, 3, padding=1, dtype=self.dtype, name="reduce1")(
            x, train
        )
        return x


def _up2(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, align_corners=True (torch nn.Upsample in NCD)."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=True)


class NeighborConnectionDecoder(nn.Module):
    """Neighbor-connection decoder: fuse 3 pyramid levels into 1-ch logits.

    Takes (zt5 @ H/32, zt4 @ H/16, zt3 @ H/8), each ``channel``-wide, and
    produces logits at H (x8 bilinear upsample of the H/8 map, default
    align_corners=False). (reference: create_backbone.py:46-76)

    ``final_upsample=False`` returns the H/8 logits (the DGNet variant,
    lib/DGNet.py:125-155, which upsamples externally).
    """

    channel: int = 32
    final_upsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, zt5, zt4, zt3, train: bool = False):
        c, dt = self.channel, self.dtype
        conv_up1 = ConvBR(c, 3, padding=1, dtype=dt, name="conv_upsample1")
        conv_up2 = ConvBR(c, 3, padding=1, dtype=dt, name="conv_upsample2")
        conv_up3 = ConvBR(c, 3, padding=1, dtype=dt, name="conv_upsample3")
        conv_up4 = ConvBR(c, 3, padding=1, dtype=dt, name="conv_upsample4")
        conv_up5 = ConvBR(2 * c, 3, padding=1, dtype=dt, name="conv_upsample5")
        conv_cat2 = ConvBR(2 * c, 3, padding=1, dtype=dt, name="conv_concat2")
        conv_cat3 = ConvBR(3 * c, 3, padding=1, dtype=dt, name="conv_concat3")
        conv4 = ConvBR(3 * c, 3, padding=1, dtype=dt, name="conv4")
        conv5 = nn.Conv(1, (1, 1), dtype=dt, name="conv5")

        zt4_1 = conv_up1(_up2(zt5), train) * zt4
        zt3_1 = conv_up2(_up2(zt4_1), train) * conv_up3(_up2(zt4), train) * zt3

        zt4_2 = conv_cat2(
            jnp.concatenate([zt4_1, conv_up4(_up2(zt5), train)], axis=-1), train
        )
        zt3_2 = conv_cat3(
            jnp.concatenate([zt3_1, conv_up5(_up2(zt4_2), train)], axis=-1), train
        )

        logits = conv5(conv4(zt3_2, train))
        if not self.final_upsample:
            return logits
        _, h, w, _ = logits.shape
        return resize_bilinear(
            logits.astype(jnp.float32), (8 * h, 8 * w), align_corners=False
        )


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC features (SAM-style).

    (reference: model/EMIP_short/motion/common.py:31-43)
    """

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        xn = (x - mu) / jnp.sqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return xn * scale + bias


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC pixel shuffle: [B, H, W, C*r^2] -> [B, H*r, W*r, C].

    Channel order matches torch.nn.PixelShuffle (channels factored as
    (C, r, r) with r-major spatial interleave).
    """
    b, h, w, c = x.shape
    r = factor
    x = x.reshape(b, h, w, c // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c // (r * r))


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC pixel unshuffle: [B, H*r, W*r, C] -> [B, H, W, C*r^2]."""
    b, hr, wr, c = x.shape
    r = factor
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h, w, c * r * r)


class PixelShuffleDownsample(nn.Module):
    """conv(C -> C/2) + pixel-unshuffle(2): spatial /2, channels x2.

    Dead alternate in the reference (never instantiated, model.py:14-22);
    carried for catalogue completeness.
    """

    n_feat: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.n_feat // 2, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return pixel_unshuffle(y, 2)


class PixelShuffleUpsample(nn.Module):
    """conv(C -> 2C) + pixel-shuffle(2): spatial x2, channels /2.

    Dead alternate in the reference (model.py:24-31); carried for
    catalogue completeness.
    """

    n_feat: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(2 * self.n_feat, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return pixel_shuffle(y, 2)
