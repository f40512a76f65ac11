"""Prompt-interaction modules: the MDTA cross-attention Injector.

The two cross-stream prompt modules of the framework — the *camouflage
feeder* (segmentation -> motion) and the *motion collector* (motion ->
segmentation) — are each one Restormer-style MDTA transformer block with a
gated-dconv FFN (reference: ``model/EMIP_short/motion/PromptInteract.py``:
``Injector`` :452-464, ``TransformerBlock_MDTA`` :436-450, ``Attention_MDTA``
:390-432, ``FeedForward`` :367-385, ``LayerNorm`` :316-362).

MDTA attends over *channels* (a [C/h, C/h] attention per head) rather than
pixels, so at 44x44x128 the matmuls are [64, 1936] x [1936, 64] — long-K
contractions that map well onto the MXU. NHWC layout throughout; channel
LayerNorm is just a last-axis norm, no transposes needed.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis of NHWC features.

    ``with_bias`` selects the reference's WithBias (mean-subtracting)
    variant vs. the BiasFree (rms-like) one; eps 1e-5, biased variance.
    """

    with_bias: bool = True
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        if self.with_bias:
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
            xn = (x32 - mu) / jnp.sqrt(var + self.epsilon)
        else:
            var = jnp.var(x32, axis=-1, keepdims=True)
            xn = x32 / jnp.sqrt(var + self.epsilon)
        c = x.shape[-1]
        xn = xn * self.param("scale", nn.initializers.ones, (c,))
        if self.with_bias:
            xn = xn + self.param("bias", nn.initializers.zeros, (c,))
        return xn.astype(x.dtype)


def _dwconv(features: int, name: str, use_bias: bool, dtype):
    return nn.Conv(
        features,
        (3, 3),
        padding=1,
        feature_group_count=features,
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


class MDTAttention(nn.Module):
    """Multi-dconv-head transposed (channel) cross-attention.

    q comes from stream ``x``; k/v from stream ``ctx``. Per head the
    attention matrix is [C/h, C/h] with q/k L2-normalized along the pixel
    axis and a learned per-head temperature.
    """

    dim: int
    num_heads: int = 2
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx):
        b, h, w, c = x.shape
        heads = self.num_heads
        ch = c // heads

        q = nn.Conv(c, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="q")(x)
        q = _dwconv(c, "q_dwconv", self.use_bias, self.dtype)(q)
        kv = nn.Conv(
            2 * c, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="kv"
        )(ctx)
        kv = _dwconv(2 * c, "kv_dwconv", self.use_bias, self.dtype)(kv)
        k, v = jnp.split(kv, 2, axis=-1)

        def to_heads(t):  # [B,H,W,C] -> [B, heads, C/h, HW]
            t = t.reshape(b, h * w, heads, ch)
            return t.transpose(0, 2, 3, 1)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        # L2-normalize along pixels (fp32 for stability)
        q = _l2_normalize(q)
        k = _l2_normalize(k)

        temperature = self.param(
            "temperature", nn.initializers.ones, (heads, 1, 1)
        )
        # bf16 MXU matmuls, fp32 accumulation + softmax
        attn = (
            jnp.einsum("bhcn,bhdn->bhcd", q, k,
                       preferred_element_type=jnp.float32)
            * temperature
        )
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn.astype(x.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c).astype(x.dtype)
        return nn.Conv(
            c, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="project_out"
        )(out)


def _l2_normalize(t, eps: float = 1e-12):
    t32 = t.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True))
    return (t32 / jnp.maximum(norm, eps)).astype(t.dtype)


class GatedDConvFFN(nn.Module):
    """Gated-dconv feed-forward network (GDFN)."""

    dim: int
    expansion: float = 2.66
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        y = nn.Conv(
            2 * hidden, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            name="project_in",
        )(x)
        y = _dwconv(2 * hidden, "dwconv", self.use_bias, self.dtype)(y)
        y1, y2 = jnp.split(y, 2, axis=-1)
        y = nn.gelu(y1, approximate=False) * y2
        return nn.Conv(
            self.dim, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            name="project_out",
        )(y)


class Injector(nn.Module):
    """One MDTA cross-attention block: inject ``ctx`` features into ``x``.

    Used twice with separate weights: camouflage feeder
    ``injector(flow_feat, seg_feat)`` and motion collector
    ``injector1(seg_feat, corr_embedding)`` (reference: model.py:92-97).
    """

    dim: int = 128
    num_heads: int = 2
    ffn_expansion: float = 2.66
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx):
        attn = MDTAttention(
            self.dim, self.num_heads, use_bias=False, dtype=self.dtype, name="attn"
        )
        ffn = GatedDConvFFN(
            self.dim, self.ffn_expansion, use_bias=False, dtype=self.dtype,
            name="ffn",
        )
        norm1 = ChannelLayerNorm(name="norm1")
        norm2 = ChannelLayerNorm(name="norm2")
        norm3 = ChannelLayerNorm(name="norm3")
        x = x + attn(norm1(x), norm2(ctx))
        x = x + ffn(norm3(x))
        return x
