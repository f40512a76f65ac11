#!/usr/bin/env python
"""Find the fastest TPU formulation for the loss's bilinear warp gather and
the occlusion splat at 352^2, bs=8."""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

BS, SIZE, C = 8, 352, 3


from tools._timing import timed as _timed


def timed(fn, args, n=8):
    return _timed(fn, args, n)


# ---------------- gather variants: out[n,hw,c] = img[n, idx[n,hw], c]


def g_take_along(img, idx):
    n, hw, c = img.shape
    return jnp.take_along_axis(img, idx[..., None], axis=1)


def g_flat_take(img, idx):
    n, hw, c = img.shape
    flat = img.reshape(n * hw, c)
    off = (jnp.arange(n, dtype=jnp.int32) * hw)[:, None]
    return jnp.take(flat, idx + off, axis=0)


def g_vmap_take(img, idx):
    return jax.vmap(lambda im, ix: jnp.take(im, ix, axis=0))(img, idx)


def g_onehot_chunk(img, idx, chunk=2816):
    """one-hot matmul per chunk (bf16 weights, fp32 accum)"""
    n, hw, c = img.shape
    nchunks = hw // chunk
    idxs = idx.reshape(n, nchunks, chunk)

    def body(carry, ic):
        oh = jax.nn.one_hot(ic, hw, dtype=jnp.bfloat16)  # [n, chunk, hw]
        out = jnp.einsum("nqh,nhc->nqc", oh, img.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return carry, out

    _, outs = lax.scan(body, None, jnp.moveaxis(idxs, 1, 0))
    return jnp.moveaxis(outs, 0, 1).reshape(n, hw, c)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((BS, SIZE * SIZE, C)), jnp.float32)
    idx = jnp.asarray(
        rng.integers(0, SIZE * SIZE, (BS, SIZE * SIZE)), jnp.int32)

    want = np.asarray(g_take_along(img, idx))
    for name, fn in [("take_along_axis", g_take_along),
                     ("flat_take", g_flat_take),
                     ("vmap_take", g_vmap_take)]:
        got = np.asarray(jax.jit(fn)(img, idx))
        np.testing.assert_allclose(got, want, atol=0)
        t = timed(jax.jit(fn), (img, idx))
        print(f"gather {name:<16} {t*1e3:8.2f} ms")

    # ---------------- splat variants
    coords = jnp.asarray(
        rng.uniform(-5, SIZE + 5, (BS, SIZE, SIZE, 2)), jnp.float32)

    from emip_tpu.ops.warp import forward_splat_density

    t = timed(jax.jit(forward_splat_density), (coords,))
    print(f"splat scatter          {t*1e3:8.2f} ms")

    def splat_matmul(coords, rows_per_chunk=16):
        n, h, w, _ = coords.shape
        x = coords[..., 0].reshape(n, h // rows_per_chunk, -1)  # [n,k,q]
        y = coords[..., 1].reshape(n, h // rows_per_chunk, -1)
        rr = jnp.arange(h, dtype=jnp.float32)
        cc = jnp.arange(w, dtype=jnp.float32)

        def body(carry, xy):
            xc, yc = xy  # [n, q]
            a = jnp.maximum(0.0, 1.0 - jnp.abs(yc[..., None] - rr))
            b = jnp.maximum(0.0, 1.0 - jnp.abs(xc[..., None] - cc))
            return carry + jnp.einsum(
                "nqh,nqw->nhw", a, b, preferred_element_type=jnp.float32), None

        init = jnp.zeros((n, h, w), jnp.float32)
        out, _ = lax.scan(
            body, init, (jnp.moveaxis(x, 1, 0), jnp.moveaxis(y, 1, 0)))
        return out

    want_d = np.asarray(jax.jit(forward_splat_density)(coords))
    got_d = np.asarray(jax.jit(splat_matmul)(coords))
    err = np.abs(got_d - want_d).max()
    print(f"splat matmul max err vs scatter: {err:.2e}")
    for rpc in (8, 16, 32, 44):
        f = jax.jit(partial(splat_matmul, rows_per_chunk=rpc))
        t = timed(f, (coords,))
        print(f"splat matmul rpc={rpc:<3}    {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()


def bench_patch_gather():
    """One lax.gather of [2,2,C] patches vs four corner gathers."""
    import jax.lax as lax
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, C)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 2)) * 5,
                       jnp.float32)

    from emip_tpu.ops.geometry import bilinear_sample, coords_grid

    def warp_current(img, flow):
        grid = coords_grid(SIZE, SIZE)[None] + flow
        return bilinear_sample(img, grid, padding_mode="border")

    def warp_patch(img, flow):
        h = w = SIZE
        grid = coords_grid(h, w)[None] + flow
        x = grid[..., 0]
        y = grid[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        bx = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
        by = jnp.clip(y0, 0, h - 2).astype(jnp.int32)
        starts = jnp.stack([by.reshape(BS, -1), bx.reshape(BS, -1)], -1)

        def g(im, st):  # im [h,w,c], st [Q,2]
            dn = lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1))
            return lax.gather(im, st, dn, slice_sizes=(2, 2, C),
                              mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

        patch = jax.vmap(g)(img, starts)  # [BS, Q, 2, 2, C]
        patch = patch.reshape(BS, h, w, 2, 2, C)

        x0c = jnp.clip(x0, 0, w - 1)
        x1c = jnp.clip(x0 + 1, 0, w - 1)
        y0c = jnp.clip(y0, 0, h - 1)
        y1c = jnp.clip(y0 + 1, 0, h - 1)
        wx1 = x - x0
        wx0 = 1.0 - wx1
        wy1 = y - y0
        wy0 = 1.0 - wy1
        bxf = bx.astype(jnp.float32)
        byf = by.astype(jnp.float32)
        # weight of patch column r (= bx + r): sum of corner weights that
        # clamp onto that column
        wcol0 = wx0 * (x0c == bxf) + wx1 * (x1c == bxf)
        wcol1 = wx0 * (x0c == bxf + 1) + wx1 * (x1c == bxf + 1)
        wrow0 = wy0 * (y0c == byf) + wy1 * (y1c == byf)
        wrow1 = wy0 * (y0c == byf + 1) + wy1 * (y1c == byf + 1)
        wgt = jnp.stack([
            wrow0 * wcol0, wrow0 * wcol1, wrow1 * wcol0, wrow1 * wcol1,
        ], -1).reshape(BS, h, w, 2, 2)
        return jnp.sum(patch * wgt[..., None], axis=(3, 4))

    want = np.asarray(jax.jit(warp_current)(img, flow))
    got = np.asarray(jax.jit(warp_patch)(img, flow))
    err = np.abs(got - want).max()
    print(f"warp patch-gather max err: {err:.2e}")
    t = timed(jax.jit(warp_current), (img, flow))
    print(f"warp current (4 gathers)  {t*1e3:8.2f} ms")
    t = timed(jax.jit(warp_patch), (img, flow))
    print(f"warp patch-gather         {t*1e3:8.2f} ms")


bench_patch_gather()
