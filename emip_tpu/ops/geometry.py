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
import numpy as np

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
    table_dtype=None,
) -> jnp.ndarray:
    """Sample NHWC ``img`` at pixel ``coords`` [N, H', W', 2] (x, y).

    Matches torch.grid_sample bilinear with align_corners=True after
    unnormalizing: x_pix in [0, W-1], y_pix in [0, H-1].

    TPU formulation: ONE flattened gather of 4C-channel "corner-packed"
    rows instead of four per-corner gathers — the packed image holds each
    pixel's (y,x), (y,x+1), (y+1,x), (y+1,x+1) values side by side, so a
    single take at the clamped base corner fetches all four bilinear taps.
    Per-corner weights are re-derived against the base so border clamping
    (and zeros-mode validity) stays exact.

    Measured dead end (do not redo): gathering from a *leaf* [Q, 8] fp32
    table is ~8x faster than 16 lanes (tools/bench_gather_layouts.py), but
    splitting this gather into two 8-lane takes of computed tables is
    SLOWER in-graph (12.7 vs 7.2 ms, tools/bench_warp_variants.py) — XLA
    lays computed tables out 128-lane padded, so per-row fetch cost is the
    tile, not the lanes; optimization_barrier does not recover the leaf
    layout (9.7 ms).

    ``table_dtype`` (e.g. jnp.bfloat16) quantizes the gather table only —
    corner weights and the weighted sum stay fp32, so only the sampled
    values carry the quantization (~0.4% relative for ImageNet-normalized
    images, below bf16-training activation noise). Default None keeps the
    table in the input dtype (exact; parity tests rely on it).
    """
    n, h, w, c = img.shape
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    # corner-packed image: [..., 4C] = (y,x), (y,x+1), (y+1,x), (y+1,x+1),
    # edge-replicated so base-corner clamping keeps slots in range.
    # Channel count padded to a multiple of 4C+4: a 12-lane gather produced
    # tail-tile garbage on TPU (last batch/row elements read -inf).
    xs = jnp.concatenate(
        [img, jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)],
        axis=-1,
    )
    packed = jnp.concatenate(
        [xs, jnp.concatenate([xs[:, 1:], xs[:, -1:]], axis=1)], axis=-1
    )
    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 0), (0, 4)))
    if table_dtype is not None:
        packed = packed.astype(table_dtype)
    flat = packed.reshape(n * h * w, 4 * c + 4)

    bx = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
    by = jnp.clip(y0, 0, h - 2).astype(jnp.int32)
    batch_off = (jnp.arange(n, dtype=jnp.int32) * (h * w)).reshape(
        (n,) + (1,) * (coords.ndim - 2)
    )
    idx = by * w + bx + batch_off
    # TPU gathers are superlinear in output rows: splitting one ~1M-row
    # take into 8 smaller takes measured 4.6 vs 6.4 ms
    # (tools/bench_gather_chunked.py); chunk large gathers.
    rows = int(np.prod(idx.shape))
    chunks = 8 if rows >= 8 * 65536 and rows % 8 == 0 else 1
    if chunks > 1:
        flat_idx = idx.reshape(-1)
        qs = rows // chunks
        got = jnp.concatenate(
            [jnp.take(flat, flat_idx[i * qs : (i + 1) * qs], axis=0)
             for i in range(chunks)], axis=0,
        ).reshape(idx.shape + (4 * c + 4,))
    else:
        got = jnp.take(flat, idx, axis=0)  # [..., 4C+4]

    x0r = x0.astype(jnp.int32)  # raw (unclamped) corner indices
    y0r = y0.astype(jnp.int32)
    if padding_mode == "zeros":
        inx0 = (x0 >= 0) & (x0 <= w - 1)
        inx1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
        iny0 = (y0 >= 0) & (y0 <= h - 1)
        iny1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
        wcol0 = wx0 * (inx0 & (x0r == bx)) + wx1 * (inx1 & (x0r + 1 == bx))
        wcol1 = (wx0 * (inx0 & (x0r == bx + 1))
                 + wx1 * (inx1 & (x0r + 1 == bx + 1)))
        wrow0 = wy0 * (iny0 & (y0r == by)) + wy1 * (iny1 & (y0r + 1 == by))
        wrow1 = (wy0 * (iny0 & (y0r == by + 1))
                 + wy1 * (iny1 & (y0r + 1 == by + 1)))
    else:  # border: weight goes to whichever slot the corner clamps onto
        x0i = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
        x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
        y0i = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
        y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
        wcol0 = wx0 * (x0i == bx) + wx1 * (x1i == bx)
        wcol1 = wx0 * (x0i == bx + 1) + wx1 * (x1i == bx + 1)
        wrow0 = wy0 * (y0i == by) + wy1 * (y1i == by)
        wrow1 = wy0 * (y0i == by + 1) + wy1 * (y1i == by + 1)

    if table_dtype is not None:
        got = got.astype(jnp.float32)
    out = (
        got[..., 0:c] * (wrow0 * wcol0)[..., None]
        + got[..., c : 2 * c] * (wrow0 * wcol1)[..., None]
        + got[..., 2 * c : 3 * c] * (wrow1 * wcol0)[..., None]
        + got[..., 3 * c : 4 * c] * (wrow1 * wcol1)[..., None]
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
