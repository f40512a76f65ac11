"""EfficientNet-B1/B4 alternate backbone (MBConv + SE).

The reference ships an EfficientNet option that cannot run: its forward
indexes ``extract_endpoints`` (a method) as a dict and imports a missing
``lib/utils`` (SURVEY.md §7.3, ``create_backbone.py:146-153``). This module
provides a *working* equivalent: standard compound-scaled EfficientNet
returning the reduction endpoints; the segmentation stream consumes the
last three (/8, /16, /32).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# (expand_ratio, channels, repeats, stride, kernel) — B0 base
_B0_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

_SCALING = {  # width_mult, depth_mult
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b4": (1.4, 1.8),
}


def _round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def _round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def _bn(name: str, train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1e-3, dtype=jnp.float32, name=name)


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        mid = self.in_ch * self.expand
        if self.expand != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(x)
            x = nn.silu(_bn("bn0", train)(x))
        x = nn.Conv(
            mid, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2, feature_group_count=mid,
            use_bias=False, dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.silu(_bn("bn1", train)(x))

        # squeeze-excitation on the *input* channel budget
        se_ch = max(1, int(self.in_ch * self.se_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_ch, (1, 1), dtype=self.dtype, name="se_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(s)
        x = x * nn.sigmoid(s)

        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(x)
        x = _bn("bn2", train)(x)
        if self.stride == 1 and self.in_ch == self.out_ch:
            x = x + inp
        return x


class EfficientNetBackbone(nn.Module):
    variant: str = "efficientnet_b4"
    dtype: Dtype = jnp.float32

    @staticmethod
    def stage_channels(variant: str) -> tuple[int, int, int, int]:
        """Channels of reductions 2..5 (/4, /8, /16, /32)."""
        w, d = _SCALING[variant]
        chans = [_round_filters(c, w) for (_, c, _, _, _) in _B0_BLOCKS]
        # reductions end before each stride-2 stage: /4 -> idx1, /8 -> idx2,
        # /16 -> idx4 (stride-1 stage 5 keeps /16), /32 -> idx6
        return (chans[1], chans[2], chans[4], chans[6])

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_mult, d_mult = _SCALING[self.variant]
        x = nn.Conv(_round_filters(32, w_mult), (3, 3), strides=(2, 2),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="stem")(x)
        x = nn.silu(_bn("stem_bn", train)(x))

        endpoints = []
        in_ch = _round_filters(32, w_mult)
        for si, (expand, ch, repeats, stride, kernel) in enumerate(_B0_BLOCKS):
            out_ch = _round_filters(ch, w_mult)
            for r in range(_round_repeats(repeats, d_mult)):
                s = stride if r == 0 else 1
                if s == 2:
                    endpoints.append(x)  # feature before downsampling
                x = MBConv(in_ch, out_ch, expand, s, kernel,
                           dtype=self.dtype, name=f"block{si}_{r}")(x, train)
                in_ch = out_ch
        endpoints.append(x)
        # endpoints: [/2, /4, /8, /16, /32] features
        return tuple(endpoints[1:])  # /4, /8, /16, /32
