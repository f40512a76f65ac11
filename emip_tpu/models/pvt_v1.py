"""PVT-v1 pyramid vision transformer (alternate backbone).

Re-design of the reference's selectable PVT-v1 encoder (``lib/pvt.py``):
4 stages of non-overlapping patch embedding + learned positional embeddings
(bilinearly interpolated when the resolution differs from the 224-trained
grid) + spatial-reduction attention blocks with plain MLPs. The final
stage's pos_embed carries a cls-token slot that the dense path skips.

Same TPU-first choices as :mod:`emip_tpu.models.pvt_v2`: NHWC features,
``nn.scan`` over a stage's blocks, static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from emip_tpu.ops.image import resize_bilinear

Dtype = Any

_LN = dict(epsilon=1e-6, dtype=jnp.float32)
_trunc = nn.initializers.truncated_normal(stddev=0.02)


@dataclasses.dataclass(frozen=True)
class PVTv1Config:
    embed_dims: tuple[int, ...] = (64, 128, 320, 512)
    num_heads: tuple[int, ...] = (1, 2, 5, 8)
    mlp_ratios: tuple[int, ...] = (8, 8, 4, 4)
    depths: tuple[int, ...] = (3, 4, 6, 3)
    sr_ratios: tuple[int, ...] = (8, 4, 2, 1)
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    pretrain_img_size: int = 224
    remat: bool = False


PVT_V1_VARIANTS = {
    "pvt_tiny": PVTv1Config(depths=(2, 2, 2, 2)),
    "pvt_small": PVTv1Config(depths=(3, 4, 6, 3)),
    "pvt_medium": PVTv1Config(depths=(3, 4, 18, 3)),
    "pvt_large": PVTv1Config(depths=(3, 8, 27, 3)),
}


class PVTv1Block(nn.Module):
    """Pre-norm SR-attention + plain MLP, scan form."""

    dim: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, drop_path_rate, deterministic: bool = True):
        b, h, w, c = x.shape
        heads, ch = self.num_heads, self.dim // self.num_heads

        y = nn.LayerNorm(**_LN, name="norm1")(x)
        q = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=_trunc,
                     dtype=self.dtype, name="q")(y)
        if self.sr_ratio > 1:
            kv_in = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            dtype=self.dtype, name="sr")(y)
            kv_in = nn.LayerNorm(**_LN, name="norm")(kv_in)
        else:
            kv_in = y
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, kernel_init=_trunc,
                      dtype=self.dtype, name="kv")(kv_in)
        m = kv_in.shape[1] * kv_in.shape[2]
        kv = kv.reshape(b, m, 2, heads, ch)
        k, v = kv[:, :, 0], kv[:, :, 1]
        qh = q.reshape(b, h * w, heads, ch)
        attn = jnp.einsum(
            "bnhc,bmhc->bhnm", qh, k, preferred_element_type=jnp.float32
        ) * (ch**-0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn.astype(x.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, c).astype(x.dtype)
        out = nn.Dense(c, kernel_init=_trunc, dtype=self.dtype, name="proj")(out)
        x = x + _drop_path(out, drop_path_rate, deterministic, self)

        y = nn.LayerNorm(**_LN, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, kernel_init=_trunc,
                     dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, kernel_init=_trunc, dtype=self.dtype,
                     name="fc2")(y)
        x = x + _drop_path(y, drop_path_rate, deterministic, self)
        return x, ()


def _drop_path(x, rate, deterministic, module):
    if deterministic:
        return x
    import jax

    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(module.make_rng("droppath"),
                                               shape))
    return (x * (1.0 / keep).astype(x.dtype) if hasattr(keep, "astype")
            else x / keep) * mask.astype(x.dtype)


class PVTv1(nn.Module):
    config: PVTv1Config = PVTv1Config()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        deterministic = not train
        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.depths))
        cur = 0
        outs = []
        for i in range(4):
            patch = 4 if i == 0 else 2
            x = nn.Conv(
                cfg.embed_dims[i], (patch, patch), strides=(patch, patch),
                dtype=self.dtype, name=f"patch_embed{i + 1}_proj",
            )(x)
            x = nn.LayerNorm(**_LN, name=f"patch_embed{i + 1}_norm")(x)
            b, h, w, c = x.shape

            # learned pos embed at the 224-pretrain grid, resized on use;
            # the last stage's table has a cls slot the dense path skips
            grid = cfg.pretrain_img_size // (4 * 2**i)
            n_tokens = grid * grid + (1 if i == 3 else 0)
            pos = self.param(
                f"pos_embed{i + 1}", _trunc, (n_tokens, cfg.embed_dims[i])
            )
            pos_grid = pos[1:] if i == 3 else pos
            pos_grid = pos_grid.reshape(1, grid, grid, c)
            if (h, w) != (grid, grid):
                pos_grid = resize_bilinear(pos_grid, (h, w),
                                           align_corners=False)
            x = x + pos_grid.astype(x.dtype)

            block_cls = PVTv1Block
            if cfg.remat:
                block_cls = nn.remat(PVTv1Block, static_argnums=(3,),
                                     prevent_cse=False)
            StageScan = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "droppath": True},
                in_axes=(0, nn.broadcast),
                length=cfg.depths[i],
            )
            rates = jnp.asarray(dpr[cur : cur + cfg.depths[i]], jnp.float32)
            cur += cfg.depths[i]
            x, _ = StageScan(
                dim=cfg.embed_dims[i],
                num_heads=cfg.num_heads[i],
                mlp_ratio=cfg.mlp_ratios[i],
                sr_ratio=cfg.sr_ratios[i],
                qkv_bias=cfg.qkv_bias,
                dtype=self.dtype,
                name=f"stage{i + 1}",
            )(x, rates, deterministic)
            outs.append(x)
        return tuple(outs)
