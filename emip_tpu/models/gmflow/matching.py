"""Global/local correlation matching: flow as a softmax expectation.

Re-design of the reference matching layer (``gmflow/matching.py``). Features
are NHWC; flows are [B, H, W, 2] (x, y). The global path computes a dense
[HW, HW] correlation once per pair; bidirectional flow reuses the same
correlation transposed (stacked on the batch axis). All softmax/expectation
math runs in fp32; the two matmuls dominate and run on the MXU.

A fused Pallas kernel for correlation -> softmax -> coordinate expectation
(avoiding the [B, HW, HW] probability materialization) lives in
``emip_tpu.ops.pallas.corr_softmax`` and is used by GMFlow when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emip_tpu.ops.geometry import bilinear_sample, coords_grid

__all__ = ["global_correlation_softmax", "local_correlation_softmax"]


def global_correlation_softmax(
    feature0: jnp.ndarray,
    feature1: jnp.ndarray,
    pred_bidir_flow: bool = False,
    use_pallas: bool = True,
):
    """Global matching flow.

    Returns (flow [B', H, W, 2], prob [B', HW, HW] or None, corr
    [B, H, W, HW]) where B' = 2B when bidirectional (fw then bw stacked on
    batch). The raw ``corr`` volume (pre-softmax, feature0 -> feature1) is
    consumed downstream as the motion prompt (reference: matching.py:16-20,41).

    With ``use_pallas`` the softmax expectation runs as a fused kernel that
    never materializes the [B', HW, HW] probabilities (prob returns None).
    """
    b, h, w, c = feature0.shape
    f0 = feature0.reshape(b, h * w, c)
    f1 = feature1.reshape(b, h * w, c)

    # bf16 MXU matmul, fp32 accumulation. Still required even on the fused
    # path: the raw volume is the motion prompt's input downstream.
    corr = jnp.einsum(
        "bic,bjc->bij", f0, f1, preferred_element_type=jnp.float32
    ) / (c**0.5)  # [B, HW, HW]

    grid = coords_grid(h, w).reshape(h * w, 2)  # [HW, 2]

    if use_pallas:
        from emip_tpu.ops.pallas import fused_flow_attention, softmax_expectation
        from emip_tpu.utils.knobs import resolve

        if resolve("global_match_qk_fused", 1, "EMIP_GLOBAL_MATCH_QK"):
            # flash-matching: recompute the QK correlation per row-tile
            # INSIDE the attention kernel (fused_flow_attention already is
            # softmax(q k^T / sqrt(C)) @ v). The expectation path then does
            # zero full-volume HBM traffic — only the prompt's einsum above
            # materializes corr — and the backward direction is just the
            # kernel with (f1, f0), so no [B, HW, HW] transpose either.
            gridb = jnp.broadcast_to(grid[None], (b, h * w, 2))
            fw = fused_flow_attention(f0, f1, gridb)
            if pred_bidir_flow:
                bw = fused_flow_attention(f1, f0, gridb)
                correspondence = jnp.concatenate([fw, bw], axis=0)
            else:
                correspondence = fw
        else:
            # read the materialized corr (and its transpose) row-tiled:
            # ~5 full-volume HBM round-trips vs the prompt's single write
            fw = softmax_expectation(corr, grid)
            if pred_bidir_flow:
                bw = softmax_expectation(jnp.swapaxes(corr, 1, 2), grid)
                correspondence = jnp.concatenate([fw, bw], axis=0)
            else:
                correspondence = fw
        prob = None
    else:
        if pred_bidir_flow:
            correlation = jnp.concatenate(
                [corr, jnp.swapaxes(corr, 1, 2)], axis=0
            )
        else:
            correlation = corr
        prob = jax.nn.softmax(correlation, axis=-1)
        correspondence = jnp.einsum("bij,jk->bik", prob, grid)
    flow = (correspondence - grid[None]).reshape(-1, h, w, 2)

    corr_volume = corr.reshape(b, h, w, h * w)
    return flow, prob, corr_volume


def local_correlation_softmax(
    feature0: jnp.ndarray,
    feature1: jnp.ndarray,
    local_radius: int,
):
    """Local matching within a (2R+1)^2 window (reference: matching.py:44-88).

    Provided for the corr_radius >= 0 configuration surface; the shipped
    config uses global matching (corr_radius_list: [-1]).
    """
    b, h, w, c = feature0.shape
    r = local_radius
    k = 2 * r + 1

    grid = coords_grid(h, w)  # [H, W, 2]
    dy, dx = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        indexing="ij",
    )
    offsets = jnp.stack([dx, dy], axis=-1).reshape(-1, 2)  # [(2R+1)^2, 2]

    # sample feature1 at each offset around each pixel
    sample_coords = grid[None, :, :, None, :] + offsets[None, None, None]
    # [B, H, W, K2, 2] -> flatten window axis into width for sampling
    sc = jnp.broadcast_to(sample_coords, (b, h, w, k * k, 2)).reshape(
        b, h, w * k * k, 2
    )
    win_feat = bilinear_sample(feature1, sc, padding_mode="zeros").reshape(
        b, h, w, k * k, c
    )

    corr = jnp.einsum(
        "bhwc,bhwkc->bhwk",
        feature0.astype(jnp.float32),
        win_feat.astype(jnp.float32),
    ) / (c**0.5)

    valid_x = (sample_coords[..., 0] >= 0) & (sample_coords[..., 0] < w)
    valid_y = (sample_coords[..., 1] >= 0) & (sample_coords[..., 1] < h)
    valid = (valid_x & valid_y)[0]  # [H, W, K2] (static per-pixel validity)
    corr = jnp.where(valid[None], corr, -1e9)

    prob = jax.nn.softmax(corr, axis=-1)  # [B, H, W, K2]
    correspondence = jnp.einsum(
        "bhwk,hwkc->bhwc", prob, jnp.broadcast_to(sample_coords[0], (h, w, k * k, 2))
    )
    flow = correspondence - grid[None]
    return flow, prob
