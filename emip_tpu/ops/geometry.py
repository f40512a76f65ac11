"""Flow-space geometry: pixel grids, differentiable warping, consistency checks.

JAX re-design of the flow-engine geometry layer (reference:
``model/EMIP_short/motion/gmflow/geometry.py``). Layout is NHWC; flow fields
are [N, H, W, 2] with the last axis ordered (x, y) in pixel units — the same
convention as the reference's [N, 2, H, W] channel-first fields.

``bilinear_sample`` reproduces torch ``grid_sample(..., align_corners=True)``
for both 'zeros' and 'border' padding: four-corner gathers with per-corner
validity masking. Gathers are expressed through ``jnp.take`` on a flattened
spatial axis, which XLA lowers to efficient dynamic-gather on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "coords_grid",
    "bilinear_sample",
    "flow_warp",
    "forward_backward_consistency",
]


def coords_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H, W, 2] pixel-coordinate grid, last axis = (x, y)."""
    y = jnp.arange(h, dtype=dtype)
    x = jnp.arange(w, dtype=dtype)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([xx, yy], axis=-1)


def bilinear_sample(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample NHWC ``img`` at pixel ``coords`` [N, H', W', 2] (x, y).

    Matches torch.grid_sample bilinear with align_corners=True after
    unnormalizing: x_pix in [0, W-1], y_pix in [0, H-1].
    """
    n, h, w, c = img.shape
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    # single flattened axis-0 take: measurably faster than take_along_axis
    # on TPU at 352^2 (4.4 vs 6.1 ms per corner at bs=8,
    # tools/bench_gather_variants.py)
    flat = img.reshape(n * h * w, c)
    batch_off = (jnp.arange(n, dtype=jnp.int32) * (h * w)).reshape(
        (n,) + (1,) * (coords.ndim - 2)
    )

    def gather(ix, iy):
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        idx = iyc * w + ixc  # [N, H', W']
        out = jnp.take(flat, idx + batch_off, axis=0)
        if padding_mode == "zeros":
            valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
            out = out * valid[..., None].astype(out.dtype)
        return out

    out = (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out.astype(img.dtype)


def flow_warp(
    feature: jnp.ndarray,
    flow: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Backward-warp NHWC ``feature`` by flow [N, H, W, 2] (x, y) in pixels."""
    _, h, w, _ = feature.shape
    grid = coords_grid(h, w)[None] + flow
    return bilinear_sample(feature, grid, padding_mode=padding_mode)


def forward_backward_consistency(
    fwd_flow: jnp.ndarray,
    bwd_flow: jnp.ndarray,
    alpha: float = 0.01,
    beta: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """UnFlow-style occlusion estimate from fw/bw flow disagreement.

    Flows are [N, H, W, 2]; returns float occlusion maps [N, H, W].
    (reference: gmflow/geometry.py:75-96)
    """
    flow_mag = jnp.linalg.norm(fwd_flow, axis=-1) + jnp.linalg.norm(bwd_flow, axis=-1)
    warped_bwd = flow_warp(bwd_flow, fwd_flow)
    warped_fwd = flow_warp(fwd_flow, bwd_flow)
    diff_fwd = jnp.linalg.norm(fwd_flow + warped_bwd, axis=-1)
    diff_bwd = jnp.linalg.norm(bwd_flow + warped_fwd, axis=-1)
    threshold = alpha * flow_mag + beta
    fwd_occ = (diff_fwd > threshold).astype(jnp.float32)
    bwd_occ = (diff_bwd > threshold).astype(jnp.float32)
    return fwd_occ, bwd_occ
