"""GMFlow CNN feature encoder (1/8 resolution, instance-normalized).

flax re-design of the flow-stream CNN encoder (reference:
``model/EMIP_short/motion/gmflow/backbone.py:72-192``): a 7x7 stem + three
2-residual-block stages (64 -> 96 -> 128 channels, stride to 1/8) + 1x1
projection. InstanceNorm (no affine) everywhere, matching torch defaults.

The reference also *declares* learnable adaptor convs (``dwconv64/96/128``,
``dwconv_pre/dwconv/dwconv_post``, backbone.py:102-111) whose forward use is
commented out; they exist in checkpoints and in the freeze-rule name space,
so they are created here at init time (never applied) for checkpoint-format
parity.

The multi-scale trident-conv tail (``trident_conv.py``) is dead at
num_scales=1 (backbone.py:187-191); multi-scale output is provided by plain
strided convs on demand.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def instance_norm(x: jnp.ndarray, epsilon: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel normalization over spatial dims (no affine).

    Stats accumulate in fp32 *inside* the reductions (``dtype=``/``where``
    fusion) instead of materializing an fp32 copy of the activation first —
    the copy forced every subsequent pass to run at 2x the bytes and
    dominated the GMFlow encoder's runtime (tools/profile_encoder.py).
    """
    mu = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    # E[(x-mu)^2] with the subtraction fused into the reduction pass; the
    # bf16->fp32 cast happens per-element on the fly.
    var = jnp.mean(
        jnp.square(x.astype(jnp.float32) - mu), axis=(1, 2), keepdims=True
    )
    inv = jax.lax.rsqrt(var + epsilon)
    # normalize in the storage dtype: (x - mu) * inv with fp32 scalars
    return ((x.astype(jnp.float32) - mu) * inv).astype(x.dtype)


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=self.dilation,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(
            self.features,
            (3, 3),
            padding=self.dilation,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.relu(instance_norm(y))

        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride, self.stride),
                dtype=self.dtype,
                name="downsample",
            )(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class CNNEncoder(nn.Module):
    output_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dims = (64, 96, 128)
        x = nn.Conv(
            dims[0], (7, 7), strides=(2, 2), padding=3, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(instance_norm(x))

        for i, (dim, stride) in enumerate(((dims[0], 1), (dims[1], 2), (dims[2], 2))):
            x = ResidualBlock(dim, stride=stride, dtype=self.dtype,
                              name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(dim, stride=1, dtype=self.dtype,
                              name=f"layer{i + 1}_1")(x)

        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)

        # dead-but-checkpointed adaptor convs (see module docstring)
        if self.is_initializing():
            dummy64 = jnp.zeros((1, 8, 8, 64), self.dtype)
            dummy96 = jnp.zeros((1, 8, 8, 96), self.dtype)
            dummy128 = jnp.zeros((1, 8, 8, 128), self.dtype)
            hidden = 16  # 64 * 0.25
            nn.Conv(64, (3, 3), padding=1, feature_group_count=64,
                    dtype=self.dtype, name="dwconv64")(dummy64)
            nn.Conv(96, (3, 3), padding=1, feature_group_count=96,
                    dtype=self.dtype, name="dwconv96")(dummy96)
            nn.Conv(128, (3, 3), padding=1, feature_group_count=128,
                    dtype=self.dtype, name="dwconv128")(dummy128)
            nn.Conv(hidden, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="dwconv_pre")(dummy64)
            dummy_h = jnp.zeros((1, 8, 8, hidden), self.dtype)
            nn.Conv(hidden, (3, 3), padding=1, feature_group_count=hidden,
                    dtype=self.dtype, name="dwconv")(dummy_h)
            nn.Conv(64, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="dwconv_post")(dummy_h)

        return [x]
