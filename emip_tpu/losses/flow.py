"""Unsupervised (photometric) optical-flow loss, UnFlow style.

Pure-jnp re-design of the reference flow loss (``loss/loss_flow.py:16-138``
with primitives from ``loss/loss_blocks.py``): per-pyramid-level backward
warping of each image by the opposite flow, occlusion masking from
backward-flow splat density, and a 0.15*L1 + 0.85*SSIM photometric distance,
averaged over both directions.

Behavioral notes kept from the reference:
  * the smoothness term is computed then *discarded* (loss_flow.py:134-137);
    here it is simply not computed (same loss value, less work);
  * occlusion masks are estimated at pyramid level 0 only and nearest-resized
    for other levels;
  * photometric losses are normalized by the mean occlusion mask.

API: flows are a list of (flow_fw, flow_bw) NHWC pairs [B, H, W, 2]; images
im1/im2 are NHWC [B, H, W, 3].
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from emip_tpu.ops.image import resize_area, resize_nearest
from emip_tpu.ops.warp import flow_warp_loss, occlusion_mask_backward

__all__ = ["UnsupFlowLossConfig", "unsup_flow_loss", "ssim_distance"]


@dataclasses.dataclass(frozen=True)
class UnsupFlowLossConfig:
    w_l1: float = 0.15
    w_ssim: float = 0.85
    ssim_window: int = 1  # radius; patch = 2r+1
    occ_threshold: float = 0.2
    w_scales: tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 0.0)
    warp_pad: str = "border"
    with_back: bool = True
    # gather-table dtype for the photometric warps: None = exact (input
    # dtype; parity tests rely on it), "bfloat16" halves the bytes of the
    # dominant TPU gather (the quantization, ~0.4% of ImageNet-normalized
    # values, only touches the sampled pixels — weights stay fp32)
    warp_table_dtype: str | None = None


def _avg_pool_valid(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Valid-padding mean pooling over NHWC spatial dims, stride 1.

    Separable shifted-slice sums instead of ``lax.reduce_window``: the
    window reduction lowers to ~35 GB/s effective on TPU while the shifted
    adds fuse into plain VPU passes (tools/profile_flow_loss.py).
    """
    x = x.astype(jnp.float32)
    h, w = x.shape[1], x.shape[2]
    t = x[:, : h - patch + 1]
    for i in range(1, patch):
        t = t + x[:, i : h - patch + 1 + i]
    u = t[:, :, : w - patch + 1]
    for j in range(1, patch):
        u = u + t[:, :, j : w - patch + 1 + j]
    return u / float(patch * patch)


def ssim_distance(x: jnp.ndarray, y: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """(1 - SSIM)/2 per pixel (valid window), clamped to [0, 1].

    (reference: loss/loss_blocks.py:46-65)
    """
    patch = 2 * radius + 1
    c1, c2 = 0.01**2, 0.03**2
    mu_x = _avg_pool_valid(x, patch)
    mu_y = _avg_pool_valid(y, patch)
    sigma_x = _avg_pool_valid(x * x, patch) - mu_x * mu_x
    sigma_y = _avg_pool_valid(y * y, patch) - mu_y * mu_y
    sigma_xy = _avg_pool_valid(x * y, patch) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)


def _photometric(
    cfg: UnsupFlowLossConfig,
    im_target: jnp.ndarray,
    im_recons: jnp.ndarray,
    occ_mask: jnp.ndarray,
) -> jnp.ndarray:
    terms = []
    if cfg.w_l1 > 0:
        terms.append(
            jnp.mean(cfg.w_l1 * jnp.abs(im_target - im_recons) * occ_mask)
        )
    if cfg.w_ssim > 0:
        terms.append(
            jnp.mean(
                cfg.w_ssim
                * ssim_distance(
                    im_recons * occ_mask, im_target * occ_mask, cfg.ssim_window
                )
            )
        )
    return sum(terms) / jnp.mean(occ_mask)


def unsup_flow_loss(
    flows: Sequence[tuple[jnp.ndarray, jnp.ndarray]],
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    cfg: UnsupFlowLossConfig = UnsupFlowLossConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (total_loss, warp_loss, mean_abs_flow_level0)."""
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)

    occ1_l0 = occ2_l0 = None
    warp_losses = []
    for i, (flow_fw, flow_bw) in enumerate(flows):
        if i >= len(cfg.w_scales) or cfg.w_scales[i] == 0.0:
            continue
        _, h, w, _ = flow_fw.shape
        im1_s = resize_area(im1, (h, w))
        im2_s = resize_area(im2, (h, w))

        tdt = (None if cfg.warp_table_dtype is None
               else jnp.dtype(cfg.warp_table_dtype))
        im1_recons = flow_warp_loss(im2_s, flow_fw, pad=cfg.warp_pad,
                                    table_dtype=tdt)
        im2_recons = flow_warp_loss(im1_s, flow_bw, pad=cfg.warp_pad,
                                    table_dtype=tdt)

        if i == 0:
            occ1 = 1.0 - occlusion_mask_backward(flow_bw, th=cfg.occ_threshold)
            occ2 = 1.0 - occlusion_mask_backward(flow_fw, th=cfg.occ_threshold)
            occ1_l0, occ2_l0 = occ1, occ2
        else:
            occ1 = resize_nearest(occ1_l0, (h, w))
            occ2 = resize_nearest(occ2_l0, (h, w))

        loss_warp = _photometric(cfg, im1_s, im1_recons, occ1)
        if cfg.with_back:
            loss_warp = (
                loss_warp + _photometric(cfg, im2_s, im2_recons, occ2)
            ) / 2.0
        warp_losses.append(cfg.w_scales[i] * loss_warp)

    warp_loss = sum(warp_losses)
    mean_abs = jnp.mean(
        jnp.abs(jnp.concatenate([flows[0][0], flows[0][1]], axis=-1))
    )
    return warp_loss, warp_loss, mean_abs


def unsup_flow_loss_decay(
    flows: Sequence[tuple[jnp.ndarray, jnp.ndarray]],
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    gamma: float = 0.8,
    cfg: UnsupFlowLossConfig = UnsupFlowLossConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RAFT-style gamma-decayed variant: later predictions weigh more.

    Alternate catalogued from the reference's unused ``unFlowLoss_decay``
    (loss/loss_flow.py:144-276, weights gamma^(n-1-i)); all predictions
    are full resolution in the shipped config so no pyramid resizing.
    """
    n = len(flows)
    weights = tuple(gamma ** (n - 1 - i) for i in range(n))
    decayed = dataclasses.replace(
        cfg, w_scales=tuple(w * s for w, s in zip(weights, cfg.w_scales))
    )
    return unsup_flow_loss(flows, im1, im2, decayed)
