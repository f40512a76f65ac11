"""SAM-style two-way transformer (alternate prompt-interaction module).

The reference carries the Segment-Anything mask-decoder transformer
(``model/EMIP_short/motion/transformer.py:16-240`` + ``common.py``) as the
engine behind its *dead* SAM-style prompt decoders (``PromptInteract`` /
``Interact``, superseded by the MDTA ``Injector`` — SURVEY.md §2.2). It is
provided here for API completeness: bidirectional attention between a small
set of query tokens and image tokens, with downsampled attention heads and
an MLP block, finishing with a final token->image attention.

flax/NHWC-native: image embeddings enter as [B, H, W, C]; point/query
embeddings as [B, N, C].
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class DownsampledAttention(nn.Module):
    """Multi-head attention with an internal channel downsample."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.embedding_dim // self.downsample_rate
        heads = self.num_heads
        ch = inner // heads

        def proj(name, x):
            return nn.Dense(inner, dtype=self.dtype, name=name)(x)

        q = proj("q_proj", q)
        k = proj("k_proj", k)
        v = proj("v_proj", v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, heads, ch).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        attn = jnp.einsum(
            "bhnc,bhmc->bhnm", qh, kh, preferred_element_type=jnp.float32
        ) / (ch**0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn.astype(q.dtype), vh,
                         preferred_element_type=jnp.float32)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.embedding_dim, dtype=self.dtype,
                        name="out_proj")(out.astype(q.dtype))


class MLPBlock(nn.Module):
    embedding_dim: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        y = nn.relu(y)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="lin2")(y)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        ln = lambda name: nn.LayerNorm(dtype=jnp.float32, name=name)

        # 1. self-attention on the query tokens
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = DownsampledAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(q, q, queries)
            queries = queries + attn_out
        queries = ln("norm1")(queries)

        # 2. tokens -> image cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = DownsampledAttention(
            self.embedding_dim, self.num_heads,
            self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = ln("norm2")(queries + attn_out)

        # 3. MLP on tokens
        queries = ln("norm3")(
            queries + MLPBlock(self.embedding_dim, self.mlp_dim,
                               dtype=self.dtype, name="mlp")(queries)
        )

        # 4. image -> tokens cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = DownsampledAttention(
            self.embedding_dim, self.num_heads,
            self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = ln("norm4")(keys + attn_out)

        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 128
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: [B, H, W, C]; point_embedding: [B, N, C].

        Returns (queries [B, N, C], keys [B, HW, C]).
        """
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c)
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layer{i}",
            )(queries, keys, point_embedding, key_pe)

        # final token -> image attention
        q = queries + point_embedding
        k = keys + key_pe
        attn_out = DownsampledAttention(
            self.embedding_dim, self.num_heads,
            self.attention_downsample_rate, dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm_final_attn")(
            queries + attn_out
        )
        return queries, keys
