"""Image resizing / normalization primitives, TPU-first.

All resizes are expressed as *separable matmul interpolation*: for a static
(in_size, out_size) pair we precompute a dense [out, in] weight matrix on host
and contract it with the image rows/cols. On TPU this maps straight onto the
MXU and fuses with neighbouring ops, unlike gather-based resizing.

Semantics follow torch's ``F.interpolate`` modes used by the reference
(``/root/reference``):
  * bilinear, align_corners=True   (NCD 2x upsampling, flow upsampling)
  * bilinear, align_corners=False  (final x8 logit upsample, eval resize)
  * area                            (loss-side image pyramids, loss_flow.py:87)
  * nearest                         (occlusion-mask pyramids, loss_flow.py:101)

Layout is NHWC throughout.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_bilinear",
    "resize_area",
    "resize_nearest",
    "normalize_imagenet",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@functools.lru_cache(maxsize=None)
def _linear_weights(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out, in] row-interpolation matrix for 1-D linear resampling."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w


@functools.lru_cache(maxsize=None)
def _area_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] averaging matrix matching torch adaptive_avg_pool semantics.

    Output cell i uniformly averages input cells [floor(i*in/out),
    ceil((i+1)*in/out)) — the same integer-boundary rule torch's
    ``F.interpolate(mode='area')`` lowers to.
    """
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil div
        w[i, start:end] = 1.0 / (end - start)
    return w


@functools.lru_cache(maxsize=None)
def _nearest_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] 0/1 selection matrix for torch 'nearest' (floor(i*in/out))."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    idx = np.minimum((np.arange(out_size) * in_size) // out_size, in_size - 1)
    w[np.arange(out_size), idx] = 1.0
    return w


def _apply_separable(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    """Contract [N,H,W,C] with row matrix wh [H',H] and col matrix ww [W',W].

    Runs at HIGHEST precision: interpolation weights must not be rounded to
    bf16 on the MXU — resize results feed metrics and parity-critical paths.
    """
    import jax

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    wh_j = jnp.asarray(wh)
    ww_j = jnp.asarray(ww)
    hi = jax.lax.Precision.HIGHEST
    # rows first, then cols; both are plain matmuls on the MXU.
    xf = jnp.einsum("ph,nhwc->npwc", wh_j, xf, precision=hi)
    xf = jnp.einsum("qw,npwc->npqc", ww_j, xf, precision=hi)
    return xf.astype(dtype)


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor to ``out_hw`` (static shape)."""
    h, w = int(x.shape[1]), int(x.shape[2])
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(
        x,
        _linear_weights(h, oh, align_corners),
        _linear_weights(w, ow, align_corners),
    )


def resize_area(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Area (adaptive-average) resize of an NHWC tensor."""
    h, w = int(x.shape[1]), int(x.shape[2])
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, _area_weights(h, oh), _area_weights(w, ow))


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of an NHWC tensor (torch 'nearest' rule)."""
    h, w = int(x.shape[1]), int(x.shape[2])
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, _nearest_weights(h, oh), _nearest_weights(w, ow))


def resize_bilinear_np(
    x: np.ndarray, out_hw: tuple[int, int], align_corners: bool = False
) -> np.ndarray:
    """Host-side (numpy) bilinear resize of a [H, W] or [H, W, C] array.

    Same semantics as :func:`resize_bilinear`; used for per-frame
    variable-shape post-processing (resizing logits to native GT size)
    where a shape-static device program is not possible.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    h, w = x.shape[0], x.shape[1]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    wh = _linear_weights(h, oh, align_corners)
    ww = _linear_weights(w, ow, align_corners)
    out = np.einsum("ph,hwc->pwc", wh, x.astype(np.float32))
    out = np.einsum("qw,pwc->pqc", ww, out)
    return out[..., 0] if squeeze else out


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize [0,1] RGB NHWC images by ImageNet statistics."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x - mean) / std
