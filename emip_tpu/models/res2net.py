"""Res2Net-50 v1b (26w x 4s) alternate backbone.

Re-design of the reference's selectable CNN encoder
(``lib/Res2Net_v1b.py``): deep 3-conv stem, four stages of Bottle2neck
blocks with hierarchical multi-scale 3x3 convolutions (baseWidth 26,
scale 4), v1b-style avg-pool downsampling. Returns the four stage features
(256/512/1024/2048 channels at /4 /8 /16 /32).

NHWC + flax BatchNorm (running stats in ``batch_stats``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _bn(name: str, train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, name=name)


def _avg_pool(x, window: int, stride: int, padding):
    return nn.avg_pool(x, (window, window), strides=(stride, stride),
                       padding=padding)


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    base_width: int = 26
    scale: int = 4
    first_of_stage: bool = False  # 'stage' type: pool instead of residual add
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0))
        scale = self.scale
        out = nn.Conv(width * scale, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = nn.relu(_bn("bn1", train)(out))

        splits = jnp.split(out, scale, axis=-1)
        outputs = []
        prev = None
        for i in range(scale - 1):
            sp = splits[i] if (self.first_of_stage or prev is None) else (
                splits[i] + prev
            )
            sp = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                         padding=1, use_bias=False, dtype=self.dtype,
                         name=f"convs{i}")(sp)
            sp = nn.relu(_bn(f"bns{i}", train)(sp))
            outputs.append(sp)
            prev = sp
        # last split: identity, or 3x3 avg pool when downsampling a stage
        last = splits[-1]
        if self.first_of_stage and self.stride != 1:
            last = _avg_pool(last, 3, self.stride, padding=((1, 1), (1, 1)))
        outputs.append(last)
        out = jnp.concatenate(outputs, axis=-1)

        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = _bn("bn3", train)(out)

        if self.downsample:
            # v1b: avg-pool then 1x1 conv
            sc = x
            if self.stride != 1:
                sc = _avg_pool(sc, self.stride, self.stride, "VALID")
            sc = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                         dtype=self.dtype, name="down_conv")(sc)
            sc = _bn("down_bn", train)(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class Res2Net50V1b(nn.Module):
    layers: tuple[int, ...] = (3, 4, 6, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # deep stem: 3x conv3x3 (32, 32, 64)
        for i, (ch, stride) in enumerate(((32, 2), (32, 1), (64, 1))):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride), padding=1,
                        use_bias=False, dtype=self.dtype,
                        name=f"stem{i}")(x)
            x = nn.relu(_bn(f"stem_bn{i}", train)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = (64, 128, 256, 512)
        for stage, (p, n_blocks) in enumerate(zip(planes, self.layers)):
            stride = 1 if stage == 0 else 2
            x = Bottle2neck(
                planes=p, stride=stride, downsample=True,
                first_of_stage=True, dtype=self.dtype,
                name=f"layer{stage + 1}_0",
            )(x, train)
            for j in range(1, n_blocks):
                x = Bottle2neck(planes=p, dtype=self.dtype,
                                name=f"layer{stage + 1}_{j}")(x, train)
            outs.append(x)
        return tuple(outs)
