"""Sine/cosine 2-D positional embeddings (DETR convention).

The embedding is a pure static function of (h, w, channels), so it is
computed once on host with numpy and becomes a compile-time constant —
the reference recomputed it on device every forward
(``gmflow/position.py:26-46``, invoked via ``gmflow/utils.py:66-86``).

Output layout is [H, W, C] (channel-last), with the first half of channels
being the y-embedding and the second half the x-embedding, interleaved
sin/cos exactly as the reference.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

__all__ = ["sine_position_embedding"]


@functools.lru_cache(maxsize=None)
def _sine_position_np(
    h: int, w: int, num_pos_feats: int, temperature: float, normalize: bool
) -> np.ndarray:
    scale = 2.0 * math.pi
    y_embed = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x_embed = np.ones((h, 1)) * np.arange(1, w + 1, dtype=np.float64)[None, :]
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin(even) / cos(odd) per frequency
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3)
    pos_x = pos_x.reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3)
    pos_y = pos_y.reshape(h, w, -1)
    pos = np.concatenate([pos_y, pos_x], axis=2)
    return pos.astype(np.float32)


def sine_position_embedding(
    h: int,
    w: int,
    channels: int,
    temperature: float = 10000.0,
    normalize: bool = True,
) -> jnp.ndarray:
    """[H, W, channels] sine positional embedding (channels must be even)."""
    assert channels % 2 == 0
    return jnp.asarray(
        _sine_position_np(h, w, channels // 2, temperature, normalize)
    )
