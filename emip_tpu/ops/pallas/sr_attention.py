"""Fused PVTv2 spatial-reduction attention kernel.

The backbone's SR attention (reference lib/pvt_v2.py:57-129) is, per
block: q/kv/out projections, per-head [N, ch] x [ch, M] attention with an
fp32 softmax, and head split/merge transposes. In XLA this chain is the
single most expensive part of the backbone under training — ~21 of the
54 ms/call b5 grad (tools/profile_pvt_grad.py): many small ops and
head-layout transposes repeated over 52 blocks. This kernel runs the whole
chain per image in VMEM:

    q = x Wq + bq                         [N, C]
    k, v = kv_in Wkv + bkv                [M, 2C]
    per head h: p_h = softmax(q_h k_h^T / sqrt(ch))   (fp32, in VMEM)
                o_h = p_h v_h
    out = concat_h(o_h) Wproj + bproj     [N, C]

The spatial-reduction conv + LayerNorm producing ``kv_in`` (and the
pre-attention LayerNorm producing ``x``) stay in XLA — they are cheap
there, and keeping them outside makes one kernel serve all sr_ratios
(incl. sr_ratio=1 where kv_in == x, and the 'linear' pooled variant).

Backward is a second kernel over the same grid: recomputes the forward
per image and emits gx / g_kv_in plus weight/bias grads accumulated
across the grid. On non-TPU backends both kernels run in interpreter
mode (tests cover them on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_sr_attention"]

_VMEM_LIMIT = 100 * 1024 * 1024


def _fwd_kernel(x_ref, kv_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wp_ref,
                bp_ref, out_ref, *, heads):
    x = x_ref[0]  # [N, C] storage dtype
    t = kv_ref[0]  # [M, C]
    dt = x.dtype
    c = x.shape[-1]
    ch = c // heads
    inv = 1.0 / (ch**0.5)

    q = (jnp.dot(x, wq_ref[:].astype(dt),
                 preferred_element_type=jnp.float32) + bq_ref[:])
    kv = (jnp.dot(t, wkv_ref[:].astype(dt),
                  preferred_element_type=jnp.float32) + bkv_ref[:])
    k, v = kv[:, :c], kv[:, c:]

    outs = []
    for h in range(heads):
        qh = q[:, h * ch : (h + 1) * ch].astype(dt)
        kh = k[:, h * ch : (h + 1) * ch].astype(dt)
        vh = v[:, h * ch : (h + 1) * ch].astype(dt)
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv
        smax = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - smax)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(dt), vh,
                            preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1).astype(dt)
    out_ref[0] = (jnp.dot(o, wp_ref[:].astype(dt),
                          preferred_element_type=jnp.float32)
                  + bp_ref[:]).astype(out_ref.dtype)


def _bwd_kernel(x_ref, kv_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wp_ref,
                bp_ref, gout_ref,
                gx_ref, gkv_in_ref, gwq_ref, gbq_ref, gwkv_ref, gbkv_ref,
                gwp_ref, gbp_ref, *, heads):
    # Grid is (B, N // tile): j row-tiles the query tokens so the
    # [tile, M] probability/score buffers stay within scoped VMEM at
    # 512^2 stage-1 (N=16384 whole-image needed ~108MB). Weight grads
    # accumulate across the whole sequential grid; gkv_in accumulates
    # across the row tiles of each image.
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    first_tile = pl.program_id(1) == 0
    x = x_ref[0].astype(jnp.float32)
    t = kv_ref[0].astype(jnp.float32)
    c = x.shape[-1]
    ch = c // heads
    inv = 1.0 / (ch**0.5)
    wq = wq_ref[:].astype(jnp.float32)
    wkv = wkv_ref[:].astype(jnp.float32)
    wp = wp_ref[:].astype(jnp.float32)

    q = jnp.dot(x, wq, preferred_element_type=jnp.float32) + bq_ref[:]
    kv = jnp.dot(t, wkv, preferred_element_type=jnp.float32) + bkv_ref[:]
    k, v = kv[:, :c], kv[:, c:]

    g = gout_ref[0].astype(jnp.float32)
    gbp_c = jnp.sum(g, axis=0)

    # recompute heads, assemble o and grads
    o_parts, gq_parts, gk_parts, gv_parts = [], [], [], []
    go = jax.lax.dot_general(  # g @ wp^T -> [N, C]
        g, wp, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for h in range(heads):
        sl = slice(h * ch, (h + 1) * ch)
        qh, kh, vh, goh = q[:, sl], k[:, sl], v[:, sl], go[:, sl]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv
        smax = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - smax)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # [N, M]
        o_parts.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))

        gp = jax.lax.dot_general(  # goh @ vh^T -> [N, M]
            goh, vh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gv_parts.append(jax.lax.dot_general(  # p^T @ goh -> [M, ch]
            p, goh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        ds = p * (gp - jnp.sum(gp * p, axis=-1, keepdims=True))
        gq_parts.append(jnp.dot(ds, kh,
                                preferred_element_type=jnp.float32) * inv)
        gk_parts.append(jax.lax.dot_general(  # ds^T @ qh
            ds, qh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv)

    o = jnp.concatenate(o_parts, axis=-1)
    gq = jnp.concatenate(gq_parts, axis=-1)
    gkv = jnp.concatenate(
        [jnp.concatenate(gk_parts, axis=-1),
         jnp.concatenate(gv_parts, axis=-1)], axis=-1)  # [M, 2C]

    gwp_c = jax.lax.dot_general(  # o^T @ g
        o, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gbq_c = jnp.sum(gq, axis=0)
    gbkv_c = jnp.sum(gkv, axis=0)
    gwq_c = jax.lax.dot_general(
        x, gq, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwkv_c = jax.lax.dot_general(
        t, gkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gx_ref[0] = jax.lax.dot_general(
        gq, wq, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(gx_ref.dtype)
    gkv_in_c = jax.lax.dot_general(
        gkv, wkv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(gkv_in_ref.dtype)

    @pl.when(first_tile)
    def _():
        gkv_in_ref[0] = jnp.zeros_like(gkv_in_ref[0])

    gkv_in_ref[0] += gkv_in_c

    @pl.when(first)
    def _():
        for ref in (gwq_ref, gbq_ref, gwkv_ref, gbkv_ref, gwp_ref, gbp_ref):
            ref[:] = jnp.zeros_like(ref)

    gwq_ref[:] += gwq_c
    gbq_ref[:] += gbq_c
    gwkv_ref[:] += gwkv_c
    gbkv_ref[:] += gbkv_c
    gwp_ref[:] += gwp_c
    gbp_ref[:] += gbp_c


def _specs(x, kv_in):
    b, n, c = x.shape
    m = kv_in.shape[1]
    xs = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, m, c), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    wcc = pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wc2 = pl.BlockSpec((c, 2 * c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    vc = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((2 * c,), lambda i: (0,), memory_space=pltpu.VMEM)
    return xs, ks, wcc, wc2, vc, v2


def _forward_pallas(x, kv_in, wq, bq, wkv, bkv, wp, bp, heads):
    b, n, c = x.shape
    xs, ks, wcc, wc2, vc, v2 = _specs(x, kv_in)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[xs, ks, wcc, vc, wc2, v2, wcc, vc],
        out_specs=xs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )(x, kv_in, wq, bq, wkv, bkv, wp, bp)


# ~4 [tile, M] + ~4 [tile, C] fp32 buffers per backward grid step. 70MB
# keeps every 352^2 shape whole-image (the perf-verified train path;
# stage-1 estimates 68MB and compiles at ~87MB scoped) while 512^2
# stage-1 (estimate 84MB, actual ~108MB — rejected by the 100MB limit)
# row-tiles to 8192. Tests shrink this to force the multi-tile
# accumulation path on tiny shapes.
_BWD_BUDGET_BYTES = 70 * 1024 * 1024


def _bwd_row_tile(n: int, m: int, c: int) -> int:
    """Largest 8-multiple divisor of n whose backward working set fits."""
    budget = _BWD_BUDGET_BYTES
    if 4 * n * (4 * m + 4 * c) <= budget:
        return n
    for tile in (8192, 4096, 3872, 2048, 1936, 1024, 968, 512, 484, 256,
                 176, 128, 88, 64, 32, 16, 8):
        if n % tile == 0 and 4 * tile * (4 * m + 4 * c) <= budget:
            return tile
    return n


def _backward_pallas(res, gout):
    x, kv_in, wq, bq, wkv, bkv, wp, bp, heads = res
    b, n, c = x.shape
    m = kv_in.shape[1]
    tile = _bwd_row_tile(n, m, c)
    f32 = jnp.float32
    xt = pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    k2 = pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    wcc = pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    wc2 = pl.BlockSpec((c, 2 * c), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    vc = pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((2 * c,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(kv_in.shape, f32),  # accumulated over tiles
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c, 2 * c), f32),
            jax.ShapeDtypeStruct((2 * c,), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c,), f32),
        ),
        grid=(b, n // tile),
        in_specs=[xt, ks, wcc, vc, wc2, v2, wcc, vc, xt],
        out_specs=(xt, k2, wcc, vc, wc2, v2, wcc, vc),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )(x, kv_in, wq, bq, wkv, bkv, wp, bp, gout)
    gx, gkv_in = outs[0], outs[1].astype(kv_in.dtype)
    grads = [g.astype(r.dtype) for g, r in zip(outs[2:], res[2:8])]
    return (gx, gkv_in, *grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused(x, kv_in, wq, bq, wkv, bkv, wp, bp, heads):
    return _forward_pallas(x, kv_in, wq, bq, wkv, bkv, wp, bp, heads)


def _fused_fwd(x, kv_in, wq, bq, wkv, bkv, wp, bp, heads):
    out = _forward_pallas(x, kv_in, wq, bq, wkv, bkv, wp, bp, heads)
    return out, (x, kv_in, wq, bq, wkv, bkv, wp, bp, heads)


def _fused_bwd(heads, res, g):
    return _backward_pallas(res, g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_sr_attention(
    x: jnp.ndarray,
    kv_in: jnp.ndarray,
    wq: jnp.ndarray,
    bq: jnp.ndarray,
    wkv: jnp.ndarray,
    bkv: jnp.ndarray,
    wp: jnp.ndarray,
    bp: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """x: [B, N, C] (pre-normalized tokens); kv_in: [B, M, C] (reduced).

    Returns proj(multi-head-attn(q(x), kv(kv_in))): [B, N, C].
    """
    return _fused(x, kv_in, wq, bq.astype(jnp.float32), wkv,
                  bkv.astype(jnp.float32), wp, bp.astype(jnp.float32),
                  num_heads)
