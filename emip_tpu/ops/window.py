"""Swin-style window partitioning and shifted-window attention masks.

Window split/merge are pure reshape+transpose (free on TPU — layout changes
only), operating on NHWC. The shifted-window additive mask is a static
function of (h, w, splits) so it is computed once with numpy on the host and
baked into the compiled program as a constant (the reference rebuilt it every
forward on device: ``gmflow/transformer.py:19-43,450-457``).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["window_split", "window_merge", "shifted_window_mask"]


def window_split(x: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*K*K, H/K, W/K, C], row-major window order."""
    b, h, w, c = x.shape
    k = num_splits
    hs, ws = h // k, w // k
    x = x.reshape(b, k, hs, k, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * k * k, hs, ws, c)


def window_merge(x: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """Inverse of :func:`window_split`: [B*K*K, h, w, C] -> [B, K*h, K*w, C]."""
    bkk, hs, ws, c = x.shape
    k = num_splits
    b = bkk // (k * k)
    x = x.reshape(b, k, k, hs, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, k * hs, k * ws, c)


def window_split_tokens(x: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, K*K, T, C] window-token layout (row-major windows)."""
    b, h, w, c = x.shape
    k = num_splits
    hs, ws = h // k, w // k
    x = x.reshape(b, k, hs, k, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, k * k, hs * ws, c)


def window_merge_tokens(x: jnp.ndarray, num_splits: int, h: int,
                        w: int) -> jnp.ndarray:
    """Inverse of :func:`window_split_tokens`."""
    b, k2, t, c = x.shape
    k = num_splits
    hs, ws = h // k, w // k
    x = x.reshape(b, k, k, hs, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=None)
def _shifted_window_mask_np(h: int, w: int, num_splits: int) -> np.ndarray:
    """Additive attention mask [K*K, hw, hw] for shifted-window attention."""
    win_h, win_w = h // num_splits, w // num_splits
    shift_h, shift_w = win_h // 2, win_w // 2

    region = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    h_slices = (slice(0, -win_h), slice(-win_h, -shift_h), slice(-shift_h, None))
    w_slices = (slice(0, -win_w), slice(-win_w, -shift_w), slice(-shift_w, None))
    for hs in h_slices:
        for ws in w_slices:
            region[hs, ws] = cnt
            cnt += 1

    region = region.reshape(num_splits, win_h, num_splits, win_w)
    region = region.transpose(0, 2, 1, 3).reshape(num_splits * num_splits, win_h * win_w)
    diff = region[:, None, :] - region[:, :, None]
    mask = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
    return mask


def shifted_window_mask(h: int, w: int, num_splits: int) -> jnp.ndarray:
    """Static additive mask [K*K, win, win] for shifted swin attention."""
    return jnp.asarray(_shifted_window_mask_np(h, w, num_splits))
