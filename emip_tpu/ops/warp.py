"""Loss-side warping and occlusion estimation.

JAX re-design of the unsupervised-flow-loss warp utilities (reference:
``loss/warp_utils.py``). Distinct from :mod:`emip_tpu.ops.geometry` because
the loss path uses different padding conventions ('border' for photometric
reconstruction) and a forward-splat density estimate for occlusion.

The forward splat (``get_corresponding_map`` in the reference, a
``scatter_add_`` bilinear splat) is reformulated as a *triangle-kernel
matmul*: density = sum_q a(q)^T b(q) where a[q, h] = max(0, 1-|y_q - h|)
and b[q, w] = max(0, 1-|x_q - w|) are the bilinear hat weights against the
integer rows/columns. Per-corner validity/clipping falls out for free (hat
weights vanish outside the grid). A TPU scatter over 4M indices took
26.9 ms at 352^2/bs=8; the chunked matmul runs in ~1 ms on the MXU
(tools/bench_gather_variants.py).
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
    x: jnp.ndarray, flow12: jnp.ndarray, pad: str = "border",
    table_dtype=None,
) -> jnp.ndarray:
    """Backward-warp NHWC ``x`` by ``flow12`` [N,H,W,2]; border padding default.

    (reference: loss/warp_utils.py:83-93)
    """
    _, h, w, _ = x.shape
    grid = coords_grid(h, w)[None] + flow12
    return bilinear_sample(x, grid, padding_mode=pad,
                           table_dtype=table_dtype)


def forward_splat_density(coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear forward-splat a unit mass at each target coordinate.

    ``coords`` is [N, H, W, 2] of unnormalized (x, y) targets; the result is
    the [N, H, W] density of how much mass lands on each pixel. Out-of-range
    corner contributions are dropped (reference: loss/warp_utils.py:26-80 —
    the hat weights are zero outside [0, W-1] x [0, H-1], so the matmul
    reformulation reproduces the reference's in-range masking exactly).
    """
    from emip_tpu.ops.pallas.splat import splat_density_pallas

    return splat_density_pallas(coords)


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
