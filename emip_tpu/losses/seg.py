"""Supervised segmentation loss: BCE + enhanced-alignment + soft IoU.

Pure-jnp port of the hybrid E-measure loss (reference: ``loss/loss_pred.py``):
the only supervised loss in the framework. All reductions in fp32.

pred: [N, H, W, 1] logits; mask: [N, H, W, 1] in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["hybrid_e_loss"]


def hybrid_e_loss(pred: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    mask = mask.astype(jnp.float32)

    # binary cross entropy with logits, mean over everything
    wbce = jnp.mean(
        jnp.maximum(pred, 0.0) - pred * mask + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )

    p = jax.nn.sigmoid(pred)
    # enhanced-alignment term: correlate de-meaned prediction and GT
    phi_fm = p - jnp.mean(p, axis=(1, 2), keepdims=True)
    phi_gt = mask - jnp.mean(mask, axis=(1, 2), keepdims=True)
    efm = (2.0 * phi_fm * phi_gt + 1e-8) / (phi_fm * phi_fm + phi_gt * phi_gt + 1e-8)
    qfm = (1.0 + efm) ** 2 / 4.0
    eloss = 1.0 - jnp.mean(qfm, axis=(1, 2))

    # soft IoU
    inter = jnp.sum(p * mask, axis=(1, 2))
    union = jnp.sum(p + mask, axis=(1, 2))
    wiou = 1.0 - (inter + 1.0 + 1e-8) / (union - inter + 1.0 + 1e-8)

    return wbce + jnp.mean(eloss + wiou)
