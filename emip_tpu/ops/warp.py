"""Loss-side warping and occlusion estimation.

JAX re-design of the unsupervised-flow-loss warp utilities (reference:
``loss/warp_utils.py``). Distinct from :mod:`emip_tpu.ops.geometry` because
the loss path uses different padding conventions ('border' for photometric
reconstruction) and a forward-splat density estimate for occlusion.

The forward splat (``get_corresponding_map`` in the reference, a
``scatter_add_`` bilinear splat) becomes a single ``.at[].add`` scatter on a
flattened spatial axis — XLA lowers this to a TPU scatter; shapes stay static.
"""

from __future__ import annotations

import jax.numpy as jnp

from emip_tpu.ops.geometry import bilinear_sample, coords_grid

__all__ = [
    "flow_warp_loss",
    "forward_splat_density",
    "occlusion_mask_backward",
    "occlusion_mask_bidirection",
]


def flow_warp_loss(
    x: jnp.ndarray, flow12: jnp.ndarray, pad: str = "border"
) -> jnp.ndarray:
    """Backward-warp NHWC ``x`` by ``flow12`` [N,H,W,2]; border padding default.

    (reference: loss/warp_utils.py:83-93)
    """
    _, h, w, _ = x.shape
    grid = coords_grid(h, w)[None] + flow12
    return bilinear_sample(x, grid, padding_mode=pad)


def forward_splat_density(coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear forward-splat a unit mass at each target coordinate.

    ``coords`` is [N, H, W, 2] of unnormalized (x, y) targets; the result is
    the [N, H, W] density of how much mass lands on each pixel. Out-of-range
    corner contributions are dropped (reference: loss/warp_utils.py:26-80).
    """
    n, h, w, _ = coords.shape
    x = coords[..., 0].reshape(n, -1)
    y = coords[..., 1].reshape(n, -1)

    x_lo = jnp.floor(x)
    y_lo = jnp.floor(y)
    x_hi = x_lo + 1.0
    y_hi = y_lo + 1.0

    density = jnp.zeros((n, h * w), dtype=jnp.float32)
    for cx, cy in ((x_hi, y_hi), (x_hi, y_lo), (x_lo, y_hi), (x_lo, y_lo)):
        in_range = (cx >= 0) & (cx <= w - 1) & (cy >= 0) & (cy <= h - 1)
        weight = (1.0 - jnp.abs(x - cx)) * (1.0 - jnp.abs(y - cy))
        weight = jnp.where(in_range, weight, 0.0)
        idx = (
            jnp.clip(cy, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(cx, 0, w - 1).astype(jnp.int32)
        )
        density = density.at[jnp.arange(n)[:, None], idx].add(weight)
    return density.reshape(n, h, w)


def occlusion_mask_backward(flow21: jnp.ndarray, th: float = 0.2) -> jnp.ndarray:
    """Occlusion mask from backward-flow splat density (< th => occluded).

    Returns float [N, H, W, 1]. (reference: loss/warp_utils.py:106-112)
    """
    _, h, w, _ = flow21.shape
    density = forward_splat_density(coords_grid(h, w)[None] + flow21)
    occ = jnp.clip(density, 0.0, 1.0) < th
    return occ.astype(jnp.float32)[..., None]


def occlusion_mask_bidirection(
    flow12: jnp.ndarray,
    flow21: jnp.ndarray,
    scale: float = 0.01,
    bias: float = 0.5,
) -> jnp.ndarray:
    """Bidirectional-consistency occlusion mask, float [N, H, W, 1].

    (reference: loss/warp_utils.py:96-103)
    """
    flow21_warped = flow_warp_loss(flow21, flow12, pad="zeros")
    diff = flow12 + flow21_warped
    mag = jnp.sum(flow12 * flow12, axis=-1, keepdims=True) + jnp.sum(
        flow21_warped * flow21_warped, axis=-1, keepdims=True
    )
    occ = jnp.sum(diff * diff, axis=-1, keepdims=True) > scale * mag + bias
    return occ.astype(jnp.float32)
