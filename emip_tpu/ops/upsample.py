"""Flow upsampling: RAFT-style convex combination and bilinear scaling.

The convex upsampler (reference: ``gmflow/gmflow.py:56-79``) lifts a coarse
flow field [B, h, w, 2] to [B, h*K, w*K, 2] by predicting, per fine pixel, a
softmax-weighted combination over the 3x3 coarse neighbourhood. The torch
version uses ``F.unfold``; here the 9 neighbours are 9 statically-shifted,
zero-padded views — pure slices that XLA fuses into the weighted sum, with no
gather or im2col materialization.

Layouts: NHWC; flow last-axis = (x, y); mask logits are the raw conv output
with channels ordered (neighbour(9), sub_row(K), sub_col(K)) — identical to
the channel order of the reference's 1x1 conv so converted weights drop in.
"""

from __future__ import annotations

import jax.numpy as jnp

from emip_tpu.ops.image import resize_bilinear

__all__ = ["convex_upsample", "upsample_flow_bilinear"]


def _neighbors_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """[B, h, w, C] -> [B, h, w, 9, C]: zero-padded 3x3 patch, row-major."""
    b, h, w, c = x.shape
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [
        pad[:, dy : dy + h, dx : dx + w, :]
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.stack(views, axis=3)


def convex_upsample(
    flow: jnp.ndarray, mask_logits: jnp.ndarray, factor: int = 8
) -> jnp.ndarray:
    """Convex-combination upsample of flow by ``factor``.

    flow: [B, h, w, 2] at coarse resolution (values scaled by ``factor``
    internally, matching ``F.unfold(upsample_factor * flow, ...)``).
    mask_logits: [B, h, w, 9 * factor * factor].
    Returns [B, h*factor, w*factor, 2].
    """
    b, h, w, _ = flow.shape
    k = factor
    neighbors = _neighbors_3x3(flow * k)  # [B, h, w, 9, 2]
    weights = mask_logits.reshape(b, h, w, 9, k, k)
    weights = _softmax_axis(weights, 3)
    # [B, h, w, K, K, 2] = sum over 9 neighbours
    up = jnp.einsum("bhwnkl,bhwnc->bhwklc", weights, neighbors)
    # interleave sub-pixels: [B, h, K, w, K, 2] -> [B, h*K, w*K, 2]
    up = up.transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(b, h * k, w * k, 2)


def _softmax_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    m = jnp.max(x32, axis=axis, keepdims=True)
    e = jnp.exp(x32 - m)
    return (e / jnp.sum(e, axis=axis, keepdims=True)).astype(x.dtype)


def upsample_flow_bilinear(flow: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Bilinear (align_corners=True) flow upsample with magnitude scaling."""
    _, h, w, _ = flow.shape
    return (
        resize_bilinear(flow, (h * factor, w * factor), align_corners=True)
        * factor
    )
