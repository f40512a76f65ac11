"""SAM-style prompt decoders (dead alternates to the MDTA ``Injector``).

The reference carries two Segment-Anything-style prompt-interaction heads —
``PromptInteract`` and ``Interact`` — plus their helpers (``MLP``,
``PositionEmbeddingRandom``, ``PatchEmbed``, ``FlowHead``, ``PromptGenBlock``)
in ``model/EMIP_short/motion/PromptInteract.py:12-301``. They are superseded
on the live path by the MDTA ``Injector`` (SURVEY.md §2.2) and are provided
here for API/catalogue completeness, NHWC/TPU-native:

* ``PromptInteract`` (reference :12-104): a SAM mask-decoder head. Learned
  mask tokens + patch-embedded flow tokens attend against the image embedding
  through a depth-2 two-way transformer; the image embedding is upscaled 4x
  by transposed convs, combined with per-token hypernetwork MLPs into mask
  logits, then re-downscaled to a 128-channel 1/16 feature and bilinearly
  upsampled back to 1/8.
* ``Interact`` (reference :107-173): depth-1 variant that returns the
  transformer-processed image embedding directly.

Tensors are NHWC ([B, H, W, C]); token stacks are [B, N, C].
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from emip_tpu.models.sam_transformer import TwoWayTransformer
from emip_tpu.ops.image import resize_bilinear

Dtype = Any


class MLP(nn.Module):
    """MaskFormer-style MLP (reference PromptInteract.py:177-199)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(self.output_dim if last else self.hidden_dim,
                         dtype=self.dtype, name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional grid (reference PromptInteract.py:202-236).

    The gaussian projection matrix is a buffer in the reference (a fixed
    random draw, never trained); here it is a param initialized with the
    same distribution but held under ``stop_gradient`` so it stays a fixed
    random draw even if these heads are ever put on a training path.
    """

    num_pos_feats: int = 64
    scale: float = 1.0

    @nn.compact
    def __call__(self, size: int):
        gauss = jax.lax.stop_gradient(self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(stddev=self.scale),
            (2, self.num_pos_feats), jnp.float32,
        ))
        h = w = size
        # pixel-center coords normalized to [0, 1] (cumsum(ones) - 0.5) / n
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        coords = jnp.stack(
            jnp.meshgrid(x, y, indexing="xy"), axis=-1
        )  # [H, W, 2] with (x, y) order as in the reference
        coords = (2.0 * coords - 1.0) @ gauss
        coords = 2.0 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


class PatchEmbed(nn.Module):
    """Strided-conv patch embedding (reference PromptInteract.py:249-275)."""

    patch_size: int = 8
    embed_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class FlowHead(nn.Module):
    """3x3 conv -> relu -> 3x3 conv flow head (reference :238-246, unused)."""

    hidden_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        return nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                       name="conv2")(nn.relu(x))


class PromptGenBlock(nn.Module):
    """Learned prompt bank weighted by global pooling (reference :281-301)."""

    prompt_dim: int = 128
    prompt_len: int = 5
    prompt_size: int = 96
    lin_dim: int = 192
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        bank = self.param(
            "prompt_param", nn.initializers.uniform(scale=1.0),
            (self.prompt_len, self.prompt_size, self.prompt_size,
             self.prompt_dim), jnp.float32,
        )
        weights = nn.softmax(
            nn.Dense(self.prompt_len, dtype=self.dtype,
                     name="linear_layer")(x.mean(axis=(1, 2))),
            axis=-1,
        )  # [B, L]
        prompt = jnp.einsum("bl,lhwc->bhwc", weights.astype(jnp.float32), bank)
        prompt = jax.image.resize(prompt, (b, h, w, self.prompt_dim), "bilinear")
        return nn.Conv(self.prompt_dim, (3, 3), padding=1, use_bias=False,
                       dtype=self.dtype, name="conv3x3")(prompt.astype(x.dtype))


class _MaskDownscaling(nn.Module):
    """conv/LN/GELU pyramid 176 -> 22 (reference :50-58, :146-154)."""

    mask_in_chans: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ln = lambda n: nn.LayerNorm(dtype=jnp.float32, name=n)
        x = nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name="conv0")(x)
        x = nn.gelu(ln("ln0")(x).astype(self.dtype), approximate=False)
        x = nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.gelu(ln("ln1")(x).astype(self.dtype), approximate=False)
        return nn.Conv(self.embed_dim, (2, 2), strides=(2, 2),
                       dtype=self.dtype, name="conv2")(x)


class _OutputUpscaling(nn.Module):
    """Transposed-conv 4x upscaler (reference :33-39)."""

    transformer_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.transformer_dim // 4, (2, 2),
                             strides=(2, 2), dtype=self.dtype,
                             name="deconv0")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln")(x)
        x = nn.gelu(x.astype(self.dtype), approximate=False)
        x = nn.ConvTranspose(self.transformer_dim // 8, (2, 2),
                             strides=(2, 2), dtype=self.dtype,
                             name="deconv1")(x)
        return nn.gelu(x, approximate=False)


class PromptInteract(nn.Module):
    """SAM mask-decoder prompt head (reference PromptInteract.py:12-104)."""

    num_mask_tokens: int = 4
    transformer_dim: int = 128
    prompt_embed_dim: int = 128
    mask_in_chans: int = 16
    patch_size: int = 8
    inp_size: int = 352
    flow_head_hidden_dim: int = 128
    flow_head_depth: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, flow):
        """image_embeddings / flow: [B, 44, 44, 128] NHWC.

        Returns a [B, 44, 44, 128] prompt feature (reference :63-99: masks
        are predicted at 176^2, re-downscaled to 22^2x128, upsampled x2).
        """
        b, h, w, c = image_embeddings.shape
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(stddev=1.0),
            (self.num_mask_tokens, self.transformer_dim), jnp.float32,
        )
        # registered-but-unused in the reference forward (:20)
        self.param("motion_tokens", nn.initializers.zeros,
                   (self.transformer_dim,), jnp.float32)

        flow_tokens = PatchEmbed(self.patch_size, self.transformer_dim,
                                 dtype=self.dtype, name="PatchEmbed")(flow)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(mask_tokens[None].astype(flow_tokens.dtype),
                              (b, self.num_mask_tokens, self.transformer_dim)),
             flow_tokens], axis=1)

        grid = self.inp_size // self.patch_size
        image_pe = PositionEmbeddingRandom(
            self.prompt_embed_dim // 2, name="pe_layer")(grid)
        image_pe = jnp.broadcast_to(
            image_pe[None].astype(image_embeddings.dtype), (b, h, w, c))

        hs, src = TwoWayTransformer(
            depth=2, embedding_dim=self.prompt_embed_dim, num_heads=8,
            mlp_dim=2048, dtype=self.dtype, name="transformer",
        )(image_embeddings, image_pe, tokens)
        mask_tokens_out = hs[:, : self.num_mask_tokens, :]

        upscaled = _OutputUpscaling(self.transformer_dim, dtype=self.dtype,
                                    name="output_upscaling")(
            src.reshape(b, h, w, c))
        hyper_in = jnp.stack(
            [MLP(self.transformer_dim, self.transformer_dim // 8, 3,
                 dtype=self.dtype, name=f"output_hypernetworks_mlps_{i}")(
                 mask_tokens_out[:, i, :])
             for i in range(self.num_mask_tokens)], axis=1)

        if self.is_initializing():
            # flow_head is constructed but never called in the reference
            # forward (:46-48); register its params for catalogue parity.
            MLP(self.flow_head_hidden_dim, self.num_mask_tokens,
                self.flow_head_depth, dtype=self.dtype,
                name="flow_head")(mask_tokens_out[:, 0, :])

        bh, uh, uw, uc = upscaled.shape
        masks = jnp.einsum(
            "bnc,bhwc->bhwn", hyper_in, upscaled,
            preferred_element_type=jnp.float32,
        ).astype(upscaled.dtype)  # [B, 176, 176, num_mask_tokens]
        masks = _MaskDownscaling(self.mask_in_chans, self.prompt_embed_dim,
                                 dtype=self.dtype,
                                 name="mask_downscaling")(masks)
        # bilinear x2 with align_corners=True (reference :60, :99)
        return resize_bilinear(masks, (h, w), align_corners=True)


class Interact(nn.Module):
    """Depth-1 SAM interaction head (reference PromptInteract.py:107-173)."""

    num_mask_tokens: int = 4
    transformer_dim: int = 128
    prompt_embed_dim: int = 128
    mask_in_chans: int = 16
    patch_size: int = 8
    inp_size: int = 352
    flow_head_hidden_dim: int = 128
    flow_head_depth: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, flow):
        """Returns the transformer-processed image embedding [B, H, W, C]."""
        b, h, w, c = image_embeddings.shape
        flow_tokens = PatchEmbed(self.patch_size, self.transformer_dim,
                                 dtype=self.dtype, name="PatchEmbed")(flow)

        grid = self.inp_size // self.patch_size
        image_pe = PositionEmbeddingRandom(
            self.prompt_embed_dim // 2, name="pe_layer")(grid)
        image_pe = jnp.broadcast_to(
            image_pe[None].astype(image_embeddings.dtype), (b, h, w, c))

        _, src = TwoWayTransformer(
            depth=1, embedding_dim=self.prompt_embed_dim, num_heads=8,
            mlp_dim=2048, dtype=self.dtype, name="transformer",
        )(image_embeddings, image_pe, flow_tokens)

        if self.is_initializing():
            # dead-in-dead registrations mirroring the reference ctor
            # (:114-116, :129-154): token embeddings, upscaler, hyper MLPs,
            # flow head, mask downscaler.
            self.param("mask_tokens", nn.initializers.normal(stddev=1.0),
                       (self.num_mask_tokens, self.transformer_dim),
                       jnp.float32)
            self.param("motion_tokens", nn.initializers.zeros,
                       (self.transformer_dim,), jnp.float32)
            self.param("flow_tokens", nn.initializers.normal(stddev=1.0),
                       (2, self.transformer_dim), jnp.float32)
            up = _OutputUpscaling(self.transformer_dim, dtype=self.dtype,
                                  name="output_upscaling")(
                src.reshape(b, h, w, c))
            for i in range(self.num_mask_tokens):
                MLP(self.transformer_dim, self.transformer_dim // 8, 3,
                    dtype=self.dtype,
                    name=f"output_hypernetworks_mlps_{i}")(src[:, 0, :])
            MLP(self.flow_head_hidden_dim, self.num_mask_tokens,
                self.flow_head_depth, dtype=self.dtype,
                name="flow_head")(src[:, 0, :])
            _MaskDownscaling(self.mask_in_chans, self.prompt_embed_dim,
                             dtype=self.dtype, name="mask_downscaling")(
                jnp.zeros((b, up.shape[1], up.shape[2], 2), self.dtype))

        return src.reshape(b, h, w, c)
