"""Visualization / padding helpers for the long-model pipeline.

Counterparts of the reference's ``model/EMIP_long/helpers.py:33-77``:
``pad_divide_by`` pads spatial dims up to a multiple of ``d`` (centered,
matching torch.nn.functional.pad's (lw, uw, lh, uh) convention) and
``overlay_davis`` renders a DAVIS-style colored mask overlay with eroded
contours. Padding is moot at the fixed 352^2 training resolution but is
needed when running the long model on arbitrary native-resolution frames;
the overlay is a host-side numpy utility.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pad_divide_by", "overlay_davis"]


def pad_divide_by(arrays, d: int, in_size: tuple[int, int]):
    """Pad NHWC arrays so H and W are multiples of ``d`` (centered).

    Returns (padded_list, (lw, uw, lh, uh)) — the same pad tuple the
    reference returns (helpers.py:33-50) so callers can crop back.
    """
    h, w = in_size
    new_h = h + (d - h % d) % d
    new_w = w + (d - w % d) % d
    lh, uh = (new_h - h) // 2, (new_h - h) - (new_h - h) // 2
    lw, uw = (new_w - w) // 2, (new_w - w) - (new_w - w) // 2

    import jax.numpy as jnp

    out = []
    for a in arrays:
        pad = [(0, 0)] * a.ndim
        pad[-3] = (lh, uh)  # H
        pad[-2] = (lw, uw)  # W
        xp = jnp if isinstance(a, jnp.ndarray) else np
        out.append(xp.pad(a, pad))
    return out, (lw, uw, lh, uh)


def _binary_dilation_cross(mask: np.ndarray) -> np.ndarray:
    """3x3 cross-structuring-element binary dilation (scipy default)."""
    m = mask.astype(bool)
    out = m.copy()
    out[1:, :] |= m[:-1, :]
    out[:-1, :] |= m[1:, :]
    out[:, 1:] |= m[:, :-1]
    out[:, :-1] |= m[:, 1:]
    return out


def overlay_davis(image: np.ndarray, mask: np.ndarray,
                  colors=(255, 0, 0), cscale: int = 2,
                  alpha: float = 0.4) -> np.ndarray:
    """DAVIS-style segmentation overlay (reference helpers.py:54-77).

    image: [H, W, 3] uint8/float; mask: [H, W] integer object ids
    (0 = background). Object pixels are alpha-blended with the object
    color; a 1-pixel dilated contour is drawn in black.
    """
    colors = np.atleast_2d(np.reshape(colors, (-1, 3))) * cscale
    im_overlay = image.copy()

    for object_id in np.unique(mask)[1:]:
        color = colors[int(object_id) % len(colors)]
        foreground = image * alpha + np.ones(image.shape) * (1 - alpha) * color
        binary_mask = mask == object_id
        im_overlay[binary_mask] = foreground[binary_mask]
        contours = _binary_dilation_cross(binary_mask) ^ binary_mask
        im_overlay[contours, :] = 0

    return im_overlay.astype(image.dtype)
