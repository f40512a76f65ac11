#!/usr/bin/env python
"""A/B bilinear-warp formulations at the flow-loss shape (bs=8, 352^2, C=3).

Variants:
  packed16      — one 16-lane corner-packed gather (round-2 baseline)
  split8        — two 8-lane row-pair gathers, shared index
  split8_bar    — split8 with optimization_barrier'd tables (forces the
                  tables to materialize instead of fusing into the gather)
  packed16_bar  — packed16 with a barrier'd table
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

BS, SIZE, C = 8, 352, 3


from tools._timing import timed as _timed


def timed(fn, args, n=10):
    return _timed(fn, args, n)


def _weights_and_idx(img, coords):
    n, h, w, c = img.shape
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    bx = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
    by = jnp.clip(y0, 0, h - 2).astype(jnp.int32)
    off = (jnp.arange(n, dtype=jnp.int32) * (h * w)).reshape(n, 1, 1)
    idx = by * w + bx + off
    wx1, wy1 = x - x0, y - y0
    return idx, (1 - wx1, wx1, 1 - wy1, wy1)


def _tables(img, barrier):
    n, h, w, c = img.shape
    xs = jnp.concatenate(
        [img, jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)],
        axis=-1,
    )
    bot_rows = jnp.concatenate([xs[:, 1:], xs[:, -1:]], axis=1)
    pad8 = 8 - 2 * c
    top = jnp.pad(xs, ((0, 0),) * 3 + ((0, pad8),)).reshape(n * h * w, 8)
    bot = jnp.pad(bot_rows, ((0, 0),) * 3 + ((0, pad8),)).reshape(n * h * w, 8)
    packed = jnp.pad(
        jnp.concatenate([xs, bot_rows], axis=-1), ((0, 0),) * 3 + ((0, 4),)
    ).reshape(n * h * w, 4 * c + 4)
    if barrier:
        top, bot, packed = lax.optimization_barrier((top, bot, packed))
    return top, bot, packed


def _combine(got, weights, c):
    wx0, wx1, wy0, wy1 = weights
    return (
        got[..., 0:c] * (wy0 * wx0)[..., None]
        + got[..., c : 2 * c] * (wy0 * wx1)[..., None]
        + got[..., 2 * c : 3 * c] * (wy1 * wx0)[..., None]
        + got[..., 3 * c : 4 * c] * (wy1 * wx1)[..., None]
    )


def make(variant):
    barrier = variant.endswith("_bar")

    def warp(img, coords):
        n, h, w, c = img.shape
        idx, weights = _weights_and_idx(img, coords)
        top, bot, packed = _tables(img, barrier)
        if variant.startswith("split8"):
            gt = jnp.take(top, idx, axis=0)
            gb = jnp.take(bot, idx, axis=0)
            got = jnp.concatenate([gt[..., : 2 * c], gb[..., : 2 * c]], -1)
        else:
            got = jnp.take(packed, idx, axis=0)
        return jnp.mean(_combine(got, weights, c))

    return jax.jit(warp)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, C)), jnp.float32)
    coords = jnp.asarray(
        rng.uniform(-3, SIZE + 3, size=(BS, SIZE, SIZE, 2)), jnp.float32
    )
    ref = None
    for v in ("packed16", "split8", "split8_bar", "packed16_bar"):
        fn = make(v)
        out = float(fn(img, coords))
        if ref is None:
            ref = out
        assert abs(out - ref) < 1e-4, (v, out, ref)
        print(f"{v:14s} {timed(fn, (img, coords)) * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
