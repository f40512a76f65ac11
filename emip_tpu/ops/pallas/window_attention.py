"""Fused swin-window attention layer kernel for the flow transformer.

One TransformerLayer attention path (reference gmflow/transformer.py:156-196)
is, per 22x22 window: four [484,128]x[128,128] projections, a 484^2
attention, a LayerNorm and a residual — a dozen tiny XLA ops whose launch
overhead dominates at this size. This kernel runs the whole path per
(batch, window) grid cell in VMEM:

    q = x Wq; k = t Wk; v = t Wv
    p = softmax(q k^T / sqrt(C) + mask)
    msg = LayerNorm((p v) Wm)
    out = x + msg            (residual variant, self-attn layers)
    out = msg                (message variant, feeds the cross-layer FFN)

Inputs are pre-split windows [B, K2, T, C] (one reshape outside; the
shifted-window roll also stays outside). The backward pass is a second
Pallas kernel over the same (batch, window) grid: it recomputes the
forward per window in VMEM and emits input grads per cell plus weight/LN
grads accumulated across the grid in VMEM-resident output blocks — no
per-window probability tensor ever reaches HBM in either direction. On
non-TPU backends both kernels run in interpreter mode (tests cover them
on CPU).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_window_attention_layer",
    "fused_window_attention_ffn_layer",
    "fused_window_attention_block",
]

_EPS = 1e-6  # flax LayerNorm default epsilon
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7).

    Mosaic has no erf lowering (jax.lax.erf raises NotImplementedError in
    Pallas TPU kernels); this uses only exp, which lowers fine.
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(u):
    return 0.5 * u * (1.0 + _erf(u * _INV_SQRT2))


def _gelu_grad(u):
    phi = jnp.exp(-0.5 * u * u) * _INV_SQRT_2PI
    return 0.5 * (1.0 + _erf(u * _INV_SQRT2)) + u * phi


def _xla_reference(x, t, wq, wk, wv, wm, scale, bias, mask, add_residual):
    """Same math in plain XLA (backward recompute + testing oracle)."""
    c = x.shape[-1]
    q = jnp.dot(x, wq.astype(x.dtype))
    k = jnp.dot(t, wk.astype(t.dtype))
    v = jnp.dot(t, wv.astype(t.dtype))
    scores = jnp.einsum("bwlc,bwmc->bwlm", q, k,
                        preferred_element_type=jnp.float32) / (c**0.5)
    if mask is not None:
        scores = scores + mask[None]
    p = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bwlm,bwmc->bwlc", p.astype(x.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    m = jnp.dot(o, wm.astype(x.dtype)).astype(jnp.float32)
    mu = jnp.mean(m, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(m - mu), axis=-1, keepdims=True)
    msg = (m - mu) * jax.lax.rsqrt(var + _EPS) * scale + bias
    return x + msg.astype(x.dtype) if add_residual else msg.astype(x.dtype)


def _kernel(x_ref, t_ref, wq_ref, wk_ref, wv_ref, wm_ref, scale_ref,
            bias_ref, mask_ref, out_ref, *, inv_sqrt_c, with_mask,
            add_residual):
    x = x_ref[0, 0]  # [T, C]
    t = t_ref[0, 0]
    dt = x.dtype

    q = jnp.dot(x, wq_ref[:].astype(dt), preferred_element_type=jnp.float32)
    k = jnp.dot(t, wk_ref[:].astype(dt), preferred_element_type=jnp.float32)
    v = jnp.dot(t, wv_ref[:].astype(dt), preferred_element_type=jnp.float32)

    scores = jnp.dot(q.astype(dt), k.astype(dt).T,
                     preferred_element_type=jnp.float32) * inv_sqrt_c
    if with_mask:
        scores = scores + mask_ref[0]
    smax = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - smax)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    o = jnp.dot(p.astype(dt), v.astype(dt),
                preferred_element_type=jnp.float32)
    m = jnp.dot(o.astype(dt), wm_ref[:].astype(dt),
                preferred_element_type=jnp.float32)

    mu = jnp.mean(m, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(m - mu), axis=-1, keepdims=True)
    msg = (m - mu) * jax.lax.rsqrt(var + _EPS) * scale_ref[:] + bias_ref[:]
    if add_residual:
        out_ref[0, 0] = x + msg.astype(dt)
    else:
        out_ref[0, 0] = msg.astype(dt)


def _row_tile(tok: int) -> int | None:
    """q-row tile size for large windows, or None for whole-window.

    Whole-window kernels hold a [T, T] f32 score block in VMEM (4 MB at
    T=1024, the 512^2 streaming shape) and serialize each window's work
    into one long grid step. Above ``EMIP_WIN_ROWTILE_MIN_T`` tokens the
    forward instead tiles q rows over a third grid axis: scores shrink to
    [RT, T] and row tiles pipeline (k/v are computed once per window into
    VMEM scratch). T=484 (352^2) has no multiple-of-8 divisor and always
    stays whole-window.
    """
    from emip_tpu.utils.knobs import resolve

    min_t = resolve("win_rowtile_min_t", 1024, env="EMIP_WIN_ROWTILE_MIN_T")
    if tok < min_t:
        return None
    for rt in (256, 128, 64, 32, 16, 8):
        if tok % rt == 0 and rt < tok:
            return rt
    return None


def _kernel_rows(x_ref, t_ref, wq_ref, wk_ref, wv_ref, wm_ref, scale_ref,
                 bias_ref, mask_ref, out_ref, kv_ref, *, inv_sqrt_c,
                 with_mask, add_residual):
    """Row-tiled twin of :func:`_kernel` — grid (b, k2, T/RT).

    k/v for the window are projected once at the first row tile into VMEM
    scratch (persistent across sequential grid steps) and reused by the
    remaining tiles; softmax/LN/residual are row-local so each tile is
    independent given k/v.
    """
    x = x_ref[0, 0]  # [RT, C]
    t = t_ref[0, 0]  # [T, C] (block index constant in r: fetched once)
    dt = x.dtype

    @pl.when(pl.program_id(2) == 0)
    def _():
        kv_ref[0] = jnp.dot(t, wk_ref[:].astype(dt),
                            preferred_element_type=jnp.float32)
        kv_ref[1] = jnp.dot(t, wv_ref[:].astype(dt),
                            preferred_element_type=jnp.float32)

    q = jnp.dot(x, wq_ref[:].astype(dt), preferred_element_type=jnp.float32)
    k = kv_ref[0]
    v = kv_ref[1]

    scores = jnp.dot(q.astype(dt), k.astype(dt).T,
                     preferred_element_type=jnp.float32) * inv_sqrt_c
    if with_mask:
        scores = scores + mask_ref[0]
    smax = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - smax)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    o = jnp.dot(p.astype(dt), v.astype(dt),
                preferred_element_type=jnp.float32)
    m = jnp.dot(o.astype(dt), wm_ref[:].astype(dt),
                preferred_element_type=jnp.float32)

    mu = jnp.mean(m, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(m - mu), axis=-1, keepdims=True)
    msg = (m - mu) * jax.lax.rsqrt(var + _EPS) * scale_ref[:] + bias_ref[:]
    if add_residual:
        out_ref[0, 0] = x + msg.astype(dt)
    else:
        out_ref[0, 0] = msg.astype(dt)


def _forward_pallas_rows(x, t, wq, wk, wv, wm, scale, bias, mask,
                         add_residual, rt):
    b, k2, tok, c = x.shape
    with_mask = mask.shape[-1] == tok

    kernel = functools.partial(
        _kernel_rows, inv_sqrt_c=1.0 / (c**0.5), with_mask=with_mask,
        add_residual=add_residual,
    )
    row_spec = pl.BlockSpec((1, 1, rt, c), lambda i, j, r: (i, j, r, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, 1, tok, c), lambda i, j, r: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((c, c), lambda i, j, r: (0, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((c,), lambda i, j, r: (0,),
                            memory_space=pltpu.VMEM)
    if with_mask:
        mask_spec = pl.BlockSpec((1, rt, tok), lambda i, j, r: (j, r, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((1, 1, 1), lambda i, j, r: (0, 0, 0),
                                 memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, k2, tok // rt),
        in_specs=[row_spec, full_spec, w_spec, w_spec, w_spec, w_spec,
                  vec_spec, vec_spec, mask_spec],
        out_specs=row_spec,
        scratch_shapes=[pltpu.VMEM((2, tok, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, t, wq, wk, wv, wm, scale, bias, mask)


def _forward_pallas(x, t, wq, wk, wv, wm, scale, bias, mask, add_residual):
    b, k2, tok, c = x.shape
    # a real mask is [K2, T, T]; the no-mask placeholder is [1, 1, 1]
    with_mask = mask.shape[-1] == tok

    rt = _row_tile(tok)
    if rt is not None:
        return _forward_pallas_rows(x, t, wq, wk, wv, wm, scale, bias, mask,
                                    add_residual, rt)

    kernel = functools.partial(
        _kernel, inv_sqrt_c=1.0 / (c**0.5), with_mask=with_mask,
        add_residual=add_residual,
    )
    win_spec = pl.BlockSpec((1, 1, tok, c), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((c, c), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((c,), lambda i, j: (0,),
                            memory_space=pltpu.VMEM)
    if with_mask:
        mask_spec = pl.BlockSpec((1, tok, tok), lambda i, j: (j, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, k2),
        in_specs=[win_spec, win_spec, w_spec, w_spec, w_spec, w_spec,
                  vec_spec, vec_spec, mask_spec],
        out_specs=win_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, t, wq, wk, wv, wm, scale, bias, mask)


def _bwd_kernel(x_ref, t_ref, wq_ref, wk_ref, wv_ref, wm_ref, scale_ref,
                bias_ref, mask_ref, gout_ref,
                gx_ref, gt_ref, gwq_ref, gwk_ref, gwv_ref, gwm_ref,
                gscale_ref, gbias_ref, *, inv_sqrt_c, with_mask,
                add_residual):
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    x = x_ref[0, 0].astype(jnp.float32)  # [T, C]
    t = t_ref[0, 0].astype(jnp.float32)
    wq = wq_ref[:].astype(jnp.float32)
    wk = wk_ref[:].astype(jnp.float32)
    wv = wv_ref[:].astype(jnp.float32)
    wm = wm_ref[:].astype(jnp.float32)

    # --- recompute forward in VMEM (fp32) ---
    q = jnp.dot(x, wq, preferred_element_type=jnp.float32)
    k = jnp.dot(t, wk, preferred_element_type=jnp.float32)
    v = jnp.dot(t, wv, preferred_element_type=jnp.float32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_c
    if with_mask:
        scores = scores + mask_ref[0]
    smax = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - smax)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [T, T]
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    m = jnp.dot(o, wm, preferred_element_type=jnp.float32)
    mu = jnp.mean(m, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(m - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = (m - mu) * inv  # [T, C]

    # --- backward ---
    gmsg = gout_ref[0, 0].astype(jnp.float32)  # grad reaches msg directly
    gscale_c = jnp.sum(gmsg * xhat, axis=0)
    gbias_c = jnp.sum(gmsg, axis=0)

    gxhat = gmsg * scale_ref[:]
    dm = inv * (
        gxhat
        - jnp.mean(gxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(gxhat * xhat, axis=-1, keepdims=True)
    )

    go = jax.lax.dot_general(  # dm @ wm^T
        dm, wm, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwm_c = jax.lax.dot_general(  # o^T @ dm
        o, dm, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    gp = jax.lax.dot_general(  # go @ v^T -> [T, T]
        go, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gv = jax.lax.dot_general(  # p^T @ go -> [T, C]
        p, go, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (gp - jnp.sum(gp * p, axis=-1, keepdims=True))

    gq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * inv_sqrt_c
    gk = jax.lax.dot_general(  # ds^T @ q
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_c

    gx = jax.lax.dot_general(  # gq @ wq^T
        gq, wq, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if add_residual:
        gx = gx + gout_ref[0, 0].astype(jnp.float32)
    gt = (
        jax.lax.dot_general(gk, wk,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(gv, wv,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    )
    gx_ref[0, 0] = gx.astype(gx_ref.dtype)
    gt_ref[0, 0] = gt.astype(gt_ref.dtype)

    gwq_c = jax.lax.dot_general(  # x^T @ gq
        x, gq, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwk_c = jax.lax.dot_general(
        t, gk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwv_c = jax.lax.dot_general(
        t, gv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(first)
    def _():
        gwq_ref[:] = jnp.zeros_like(gwq_ref)
        gwk_ref[:] = jnp.zeros_like(gwk_ref)
        gwv_ref[:] = jnp.zeros_like(gwv_ref)
        gwm_ref[:] = jnp.zeros_like(gwm_ref)
        gscale_ref[:] = jnp.zeros_like(gscale_ref)
        gbias_ref[:] = jnp.zeros_like(gbias_ref)

    gwq_ref[:] += gwq_c
    gwk_ref[:] += gwk_c
    gwv_ref[:] += gwv_c
    gwm_ref[:] += gwm_c
    gscale_ref[:] += gscale_c
    gbias_ref[:] += gbias_c


def _backward_pallas(x, t, wq, wk, wv, wm, scale, bias, mask, gout,
                     add_residual):
    b, k2, tok, c = x.shape
    with_mask = mask.shape[-1] == tok

    kernel = functools.partial(
        _bwd_kernel, inv_sqrt_c=1.0 / (c**0.5), with_mask=with_mask,
        add_residual=add_residual,
    )
    win_spec = pl.BlockSpec((1, 1, tok, c), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((c, c), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((c,), lambda i, j: (0,),
                            memory_space=pltpu.VMEM)
    if with_mask:
        mask_spec = pl.BlockSpec((1, tok, tok), lambda i, j: (j, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM)

    gx, gt, gwq, gwk, gwv, gwm, gscale, gbias = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(t.shape, t.dtype),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
        ),
        grid=(b, k2),
        in_specs=[win_spec, win_spec, w_spec, w_spec, w_spec, w_spec,
                  vec_spec, vec_spec, mask_spec, win_spec],
        out_specs=(win_spec, win_spec, w_spec, w_spec, w_spec, w_spec,
                   vec_spec, vec_spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, t, wq, wk, wv, wm, scale, bias, mask, gout)
    return (
        gx,
        gt,
        gwq.astype(wq.dtype),
        gwk.astype(wk.dtype),
        gwv.astype(wv.dtype),
        gwm.astype(wm.dtype),
        gscale.astype(scale.dtype),
        gbias.astype(bias.dtype),
        jnp.zeros_like(mask),
    )


def _make_fused(add_residual: bool):
    @jax.custom_vjp
    def fused(x, t, wq, wk, wv, wm, scale, bias, mask):
        return _forward_pallas(x, t, wq, wk, wv, wm, scale, bias, mask,
                               add_residual)

    def fwd(x, t, wq, wk, wv, wm, scale, bias, mask):
        out = _forward_pallas(x, t, wq, wk, wv, wm, scale, bias, mask,
                              add_residual)
        return out, (x, t, wq, wk, wv, wm, scale, bias, mask)

    def bwd(res, g):
        x, t, wq, wk, wv, wm, scale, bias, mask = res
        return _backward_pallas(x, t, wq, wk, wv, wm, scale, bias, mask, g,
                                add_residual)

    fused.defvjp(fwd, bwd)
    return fused


_FUSED_RESIDUAL = _make_fused(True)
_FUSED_MESSAGE = _make_fused(False)


def fused_window_attention_layer(
    x: jnp.ndarray,
    t: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wm: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    add_residual: bool = True,
) -> jnp.ndarray:
    """x, t: [B, K2, T, C] pre-split windows; mask: [K2, T, T] or None."""
    if mask is None:
        mask = jnp.zeros((1, 1, 1), jnp.float32)
    fn = _FUSED_RESIDUAL if add_residual else _FUSED_MESSAGE
    return fn(x, t, wq, wk, wv, wm, scale.astype(jnp.float32),
              bias.astype(jnp.float32), mask.astype(jnp.float32))


# ------------------------------------------------------------------
# cross-attention + FFN layer: the full TransformerLayer (no_ffn=False)
# forward (reference transformer.py:153-211) in one kernel per window:
#   msg = LN1((softmax(x Wq (t Wk)^T / sqrt(C) + mask) t Wv) Wm)
#   out = x + LN2(W2 gelu(W0 [x, msg]))
# ------------------------------------------------------------------


def _attention_message(x, t, wq_ref, wk_ref, wv_ref, wm_ref, s1_ref, b1_ref,
                       mask_ref, *, inv_sqrt_c, with_mask):
    """Shared fp32 forward recompute: returns (p, o, m, inv1, xhat1, msg)."""
    q = jnp.dot(x, wq_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    k = jnp.dot(t, wk_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    v = jnp.dot(t, wv_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_c
    if with_mask:
        scores = scores + mask_ref[0]
    smax = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - smax)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    m = jnp.dot(o, wm_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    mu1 = jnp.mean(m, axis=-1, keepdims=True)
    var1 = jnp.mean(jnp.square(m - mu1), axis=-1, keepdims=True)
    inv1 = jax.lax.rsqrt(var1 + _EPS)
    xhat1 = (m - mu1) * inv1
    msg = xhat1 * s1_ref[:] + b1_ref[:]
    return q, k, v, p, o, inv1, xhat1, msg


def _ffn_kernel(x_ref, t_ref, wq_ref, wk_ref, wv_ref, wm_ref, s1_ref, b1_ref,
                w0a_ref, w0b_ref, w2_ref, s2_ref, b2_ref, mask_ref, out_ref,
                *, inv_sqrt_c, with_mask):
    x = x_ref[0, 0].astype(jnp.float32)
    t = t_ref[0, 0].astype(jnp.float32)
    *_, msg = _attention_message(
        x, t, wq_ref, wk_ref, wv_ref, wm_ref, s1_ref, b1_ref, mask_ref,
        inv_sqrt_c=inv_sqrt_c, with_mask=with_mask,
    )
    u = (
        jnp.dot(x, w0a_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + jnp.dot(msg, w0b_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    )
    y = _gelu_exact(u)
    z = jnp.dot(y, w2_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    mu2 = jnp.mean(z, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(z - mu2), axis=-1, keepdims=True)
    xhat2 = (z - mu2) * jax.lax.rsqrt(var2 + _EPS)
    out_ref[0, 0] = (x + xhat2 * s2_ref[:] + b2_ref[:]).astype(out_ref.dtype)


def _ffn_bwd_kernel(x_ref, t_ref, wq_ref, wk_ref, wv_ref, wm_ref, s1_ref,
                    b1_ref, w0a_ref, w0b_ref, w2_ref, s2_ref, b2_ref,
                    mask_ref, gout_ref,
                    gx_ref, gt_ref, gwq_ref, gwk_ref, gwv_ref, gwm_ref,
                    gs1_ref, gb1_ref, gw0a_ref, gw0b_ref, gw2_ref, gs2_ref,
                    gb2_ref, *, inv_sqrt_c, with_mask):
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    x = x_ref[0, 0].astype(jnp.float32)
    t = t_ref[0, 0].astype(jnp.float32)
    q, k, v, p, o, inv1, xhat1, msg = _attention_message(
        x, t, wq_ref, wk_ref, wv_ref, wm_ref, s1_ref, b1_ref, mask_ref,
        inv_sqrt_c=inv_sqrt_c, with_mask=with_mask,
    )
    w0a = w0a_ref[:].astype(jnp.float32)
    w0b = w0b_ref[:].astype(jnp.float32)
    w2 = w2_ref[:].astype(jnp.float32)
    u = (jnp.dot(x, w0a, preferred_element_type=jnp.float32)
         + jnp.dot(msg, w0b, preferred_element_type=jnp.float32))
    y = _gelu_exact(u)
    z = jnp.dot(y, w2, preferred_element_type=jnp.float32)
    mu2 = jnp.mean(z, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(z - mu2), axis=-1, keepdims=True)
    inv2 = jax.lax.rsqrt(var2 + _EPS)
    xhat2 = (z - mu2) * inv2

    g = gout_ref[0, 0].astype(jnp.float32)

    # LN2 backward
    gs2_c = jnp.sum(g * xhat2, axis=0)
    gb2_c = jnp.sum(g, axis=0)
    gxh2 = g * s2_ref[:]
    gz = inv2 * (
        gxh2
        - jnp.mean(gxh2, axis=-1, keepdims=True)
        - xhat2 * jnp.mean(gxh2 * xhat2, axis=-1, keepdims=True)
    )

    # FFN backward
    gw2_c = jax.lax.dot_general(
        y, gz, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gy = jax.lax.dot_general(
        gz, w2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gu = gy * _gelu_grad(u)
    gw0a_c = jax.lax.dot_general(
        x, gu, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gw0b_c = jax.lax.dot_general(
        msg, gu, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gx_ffn = jax.lax.dot_general(
        gu, w0a, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gmsg = jax.lax.dot_general(
        gu, w0b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # LN1 backward
    gs1_c = jnp.sum(gmsg * xhat1, axis=0)
    gb1_c = jnp.sum(gmsg, axis=0)
    gxh1 = gmsg * s1_ref[:]
    dm = inv1 * (
        gxh1
        - jnp.mean(gxh1, axis=-1, keepdims=True)
        - xhat1 * jnp.mean(gxh1 * xhat1, axis=-1, keepdims=True)
    )

    # attention backward (same as _bwd_kernel)
    wm = wm_ref[:].astype(jnp.float32)
    go = jax.lax.dot_general(
        dm, wm, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwm_c = jax.lax.dot_general(
        o, dm, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gp = jax.lax.dot_general(
        go, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gv = jax.lax.dot_general(
        p, go, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (gp - jnp.sum(gp * p, axis=-1, keepdims=True))
    gq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * inv_sqrt_c
    gk = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_c

    wq = wq_ref[:].astype(jnp.float32)
    wk = wk_ref[:].astype(jnp.float32)
    wv = wv_ref[:].astype(jnp.float32)
    gx = g + gx_ffn + jax.lax.dot_general(
        gq, wq, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gt = (
        jax.lax.dot_general(gk, wk,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(gv, wv,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    )
    gx_ref[0, 0] = gx.astype(gx_ref.dtype)
    gt_ref[0, 0] = gt.astype(gt_ref.dtype)

    gwq_c = jax.lax.dot_general(
        x, gq, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwk_c = jax.lax.dot_general(
        t, gk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwv_c = jax.lax.dot_general(
        t, gv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(first)
    def _():
        for ref in (gwq_ref, gwk_ref, gwv_ref, gwm_ref, gs1_ref, gb1_ref,
                    gw0a_ref, gw0b_ref, gw2_ref, gs2_ref, gb2_ref):
            ref[:] = jnp.zeros_like(ref)

    gwq_ref[:] += gwq_c
    gwk_ref[:] += gwk_c
    gwv_ref[:] += gwv_c
    gwm_ref[:] += gwm_c
    gs1_ref[:] += gs1_c
    gb1_ref[:] += gb1_c
    gw0a_ref[:] += gw0a_c
    gw0b_ref[:] += gw0b_c
    gw2_ref[:] += gw2_c
    gs2_ref[:] += gs2_c
    gb2_ref[:] += gb2_c


def _ffn_specs(x, t, w0a, w2, mask):
    b, k2, tok, c = x.shape
    f = w0a.shape[-1]
    with_mask = mask.shape[-1] == tok
    win = pl.BlockSpec((1, 1, tok, c), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    wcc = pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    wcf = pl.BlockSpec((c, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    wfc = pl.BlockSpec((f, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    if with_mask:
        msk = pl.BlockSpec((1, tok, tok), lambda i, j: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    else:
        msk = pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [win, win, wcc, wcc, wcc, wcc, vec, vec, wcf, wcf, wfc, vec,
                vec, msk]
    return with_mask, in_specs, dict(win=win, wcc=wcc, wcf=wcf, wfc=wfc,
                                     vec=vec)


def _ffn_kernel_rows(x_ref, t_ref, wq_ref, wk_ref, wv_ref, wm_ref, s1_ref,
                     b1_ref, w0a_ref, w0b_ref, w2_ref, s2_ref, b2_ref,
                     mask_ref, out_ref, kv_ref, *, inv_sqrt_c, with_mask):
    """Row-tiled twin of :func:`_ffn_kernel` — grid (b, k2, T/RT).

    Attention + concat-FFN + both LayerNorms are row-local given the
    window's k/v, which are projected once per window into f32 VMEM
    scratch at the first row tile (same pattern as :func:`_kernel_rows`).
    """
    x = x_ref[0, 0].astype(jnp.float32)  # [RT, C]

    @pl.when(pl.program_id(2) == 0)
    def _():
        t = t_ref[0, 0].astype(jnp.float32)
        kv_ref[0] = jnp.dot(t, wk_ref[:].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        kv_ref[1] = jnp.dot(t, wv_ref[:].astype(jnp.float32),
                            preferred_element_type=jnp.float32)

    q = jnp.dot(x, wq_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    scores = jax.lax.dot_general(
        q, kv_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_c
    if with_mask:
        scores = scores + mask_ref[0]
    smax = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - smax)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, kv_ref[1], preferred_element_type=jnp.float32)
    m = jnp.dot(o, wm_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    mu1 = jnp.mean(m, axis=-1, keepdims=True)
    var1 = jnp.mean(jnp.square(m - mu1), axis=-1, keepdims=True)
    msg = (m - mu1) * jax.lax.rsqrt(var1 + _EPS) * s1_ref[:] + b1_ref[:]

    u = (
        jnp.dot(x, w0a_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + jnp.dot(msg, w0b_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    )
    y = _gelu_exact(u)
    z = jnp.dot(y, w2_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    mu2 = jnp.mean(z, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(z - mu2), axis=-1, keepdims=True)
    xhat2 = (z - mu2) * jax.lax.rsqrt(var2 + _EPS)
    out_ref[0, 0] = (x + xhat2 * s2_ref[:] + b2_ref[:]).astype(out_ref.dtype)


def _ffn_forward_pallas_rows(x, t, wq, wk, wv, wm, s1, b1, w0a, w0b, w2, s2,
                             b2, mask, rt):
    b, k2, tok, c = x.shape
    f = w0a.shape[-1]
    with_mask = mask.shape[-1] == tok
    kernel = functools.partial(_ffn_kernel_rows, inv_sqrt_c=1.0 / (c**0.5),
                               with_mask=with_mask)
    row = pl.BlockSpec((1, 1, rt, c), lambda i, j, r: (i, j, r, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, 1, tok, c), lambda i, j, r: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    wcc = pl.BlockSpec((c, c), lambda i, j, r: (0, 0),
                       memory_space=pltpu.VMEM)
    wcf = pl.BlockSpec((c, f), lambda i, j, r: (0, 0),
                       memory_space=pltpu.VMEM)
    wfc = pl.BlockSpec((f, c), lambda i, j, r: (0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((c,), lambda i, j, r: (0,), memory_space=pltpu.VMEM)
    if with_mask:
        msk = pl.BlockSpec((1, rt, tok), lambda i, j, r: (j, r, 0),
                           memory_space=pltpu.VMEM)
    else:
        msk = pl.BlockSpec((1, 1, 1), lambda i, j, r: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, k2, tok // rt),
        in_specs=[row, full, wcc, wcc, wcc, wcc, vec, vec, wcf, wcf, wfc,
                  vec, vec, msk],
        out_specs=row,
        scratch_shapes=[pltpu.VMEM((2, tok, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, t, wq, wk, wv, wm, s1, b1, w0a, w0b, w2, s2, b2, mask)


def _ffn_forward_pallas(x, t, wq, wk, wv, wm, s1, b1, w0a, w0b, w2, s2, b2,
                        mask):
    b, k2, tok, c = x.shape
    rt = _row_tile(tok)
    if rt is not None:
        return _ffn_forward_pallas_rows(x, t, wq, wk, wv, wm, s1, b1, w0a,
                                        w0b, w2, s2, b2, mask, rt)
    with_mask, in_specs, _ = _ffn_specs(x, t, w0a, w2, mask)
    kernel = functools.partial(_ffn_kernel, inv_sqrt_c=1.0 / (c**0.5),
                               with_mask=with_mask)
    win = in_specs[0]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, k2),
        in_specs=in_specs,
        out_specs=win,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, t, wq, wk, wv, wm, s1, b1, w0a, w0b, w2, s2, b2, mask)


def _ffn_backward_pallas(res, gout):
    x, t, wq, wk, wv, wm, s1, b1, w0a, w0b, w2, s2, b2, mask = res
    b, k2, tok, c = x.shape
    f = w0a.shape[-1]
    with_mask, in_specs, sp = _ffn_specs(x, t, w0a, w2, mask)
    kernel = functools.partial(_ffn_bwd_kernel, inv_sqrt_c=1.0 / (c**0.5),
                               with_mask=with_mask)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(t.shape, t.dtype),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c, f), f32),
            jax.ShapeDtypeStruct((c, f), f32),
            jax.ShapeDtypeStruct((f, c), f32),
            jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c,), f32),
        ),
        grid=(b, k2),
        in_specs=in_specs + [sp["win"]],
        out_specs=(sp["win"], sp["win"], sp["wcc"], sp["wcc"], sp["wcc"],
                   sp["wcc"], sp["vec"], sp["vec"], sp["wcf"], sp["wcf"],
                   sp["wfc"], sp["vec"], sp["vec"]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, t, wq, wk, wv, wm, s1, b1, w0a, w0b, w2, s2, b2, mask, gout)
    gx, gt = outs[0], outs[1]
    (gwq, gwk, gwv, gwm, gs1, gb1, gw0a, gw0b, gw2, gs2, gb2) = outs[2:]
    return (gx, gt,
            gwq.astype(wq.dtype), gwk.astype(wk.dtype),
            gwv.astype(wv.dtype), gwm.astype(wm.dtype),
            gs1.astype(s1.dtype), gb1.astype(b1.dtype),
            gw0a.astype(w0a.dtype), gw0b.astype(w0b.dtype),
            gw2.astype(w2.dtype), gs2.astype(s2.dtype),
            gb2.astype(b2.dtype), jnp.zeros_like(mask))


@jax.custom_vjp
def _fused_ffn(x, t, wq, wk, wv, wm, s1, b1, w0a, w0b, w2, s2, b2, mask):
    return _ffn_forward_pallas(x, t, wq, wk, wv, wm, s1, b1, w0a, w0b, w2,
                               s2, b2, mask)


def _fused_ffn_fwd(x, t, wq, wk, wv, wm, s1, b1, w0a, w0b, w2, s2, b2, mask):
    out = _ffn_forward_pallas(x, t, wq, wk, wv, wm, s1, b1, w0a, w0b, w2,
                              s2, b2, mask)
    return out, (x, t, wq, wk, wv, wm, s1, b1, w0a, w0b, w2, s2, b2, mask)


_fused_ffn.defvjp(_fused_ffn_fwd, lambda res, g: _ffn_backward_pallas(res, g))


def fused_window_attention_ffn_layer(
    x: jnp.ndarray,
    t: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wm: jnp.ndarray,
    scale1: jnp.ndarray,
    bias1: jnp.ndarray,
    w0: jnp.ndarray,
    w2: jnp.ndarray,
    scale2: jnp.ndarray,
    bias2: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full cross-attention + concat-FFN TransformerLayer per window.

    x, t: [B, K2, T, C] pre-split windows; w0: [2C, F] (split internally
    into the x- and msg- halves); w2: [F, C]; mask: [K2, T, T] or None.
    Returns x + LN2(FFN([x, LN1(attn)])) — the reference layer's output
    (transformer.py:153-211) with zero intermediate HBM traffic.
    """
    c = x.shape[-1]
    if mask is None:
        mask = jnp.zeros((1, 1, 1), jnp.float32)
    return _fused_ffn(
        x, t, wq, wk, wv, wm,
        scale1.astype(jnp.float32), bias1.astype(jnp.float32),
        w0[:c], w0[c:], w2,
        scale2.astype(jnp.float32), bias2.astype(jnp.float32),
        mask.astype(jnp.float32),
    )

# ------------------------------------------------------------------
# whole TransformerBlock (self-attention layer + cross-attention+FFN
# layer, reference transformer.py:348-401) in ONE kernel per window:
#   x1  = x + LN1s(merge1(softmax(x Wq1 (x Wk1)^T / sqrt(C) + m) x Wv1))
#   msg = LN1c(merge2(softmax(x1 Wq2 (t Wk2)^T / sqrt(C) + m) t Wv2))
#   out = x1 + LN2c(W2 gelu(W0 [x1, msg]))
# Per-cell compute is overhead-dominated at these window sizes (~8 us
# sequencing vs ~0.5 us of matmul), so fusing the two layers halves the
# invocation count and skips the inter-layer HBM round-trip of x1.
# ------------------------------------------------------------------


def _block_self_forward(x, wq1_ref, wk1_ref, wv1_ref, wm1_ref, s1_ref,
                        b1_ref, mask_ref, *, inv_sqrt_c, with_mask):
    """Self-attention layer in the storage dtype (mirrors _kernel)."""
    dt = x.dtype
    q = jnp.dot(x, wq1_ref[:].astype(dt), preferred_element_type=jnp.float32)
    k = jnp.dot(x, wk1_ref[:].astype(dt), preferred_element_type=jnp.float32)
    v = jnp.dot(x, wv1_ref[:].astype(dt), preferred_element_type=jnp.float32)
    scores = jnp.dot(q.astype(dt), k.astype(dt).T,
                     preferred_element_type=jnp.float32) * inv_sqrt_c
    if with_mask:
        scores = scores + mask_ref[0]
    smax = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - smax)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(dt), v.astype(dt), preferred_element_type=jnp.float32)
    m = jnp.dot(o.astype(dt), wm1_ref[:].astype(dt),
                preferred_element_type=jnp.float32)
    mu = jnp.mean(m, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(m - mu), axis=-1, keepdims=True)
    msg = (m - mu) * jax.lax.rsqrt(var + _EPS) * s1_ref[:] + b1_ref[:]
    return x + msg.astype(dt)


def _block_kernel(x_ref, t_ref,
                  wq1_ref, wk1_ref, wv1_ref, wm1_ref, s1_ref, b1_ref,
                  wq2_ref, wk2_ref, wv2_ref, wm2_ref, sa_ref, ba_ref,
                  w0a_ref, w0b_ref, w2_ref, sb_ref, bb_ref,
                  mask_ref, out_ref, *, inv_sqrt_c, with_mask):
    x = x_ref[0, 0]  # [T, C] storage dtype
    x1 = _block_self_forward(
        x, wq1_ref, wk1_ref, wv1_ref, wm1_ref, s1_ref, b1_ref, mask_ref,
        inv_sqrt_c=inv_sqrt_c, with_mask=with_mask,
    )

    x1f = x1.astype(jnp.float32)
    t = t_ref[0, 0].astype(jnp.float32)
    *_, msg = _attention_message(
        x1f, t, wq2_ref, wk2_ref, wv2_ref, wm2_ref, sa_ref, ba_ref, mask_ref,
        inv_sqrt_c=inv_sqrt_c, with_mask=with_mask,
    )
    u = (jnp.dot(x1f, w0a_ref[:].astype(jnp.float32),
                 preferred_element_type=jnp.float32)
         + jnp.dot(msg, w0b_ref[:].astype(jnp.float32),
                   preferred_element_type=jnp.float32))
    y = _gelu_exact(u)
    z = jnp.dot(y, w2_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    mu2 = jnp.mean(z, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(z - mu2), axis=-1, keepdims=True)
    xhat2 = (z - mu2) * jax.lax.rsqrt(var2 + _EPS)
    out_ref[0, 0] = (x1f + xhat2 * sb_ref[:] + bb_ref[:]).astype(out_ref.dtype)


def _block_bwd_kernel(x_ref, t_ref,
                      wq1_ref, wk1_ref, wv1_ref, wm1_ref, s1_ref, b1_ref,
                      wq2_ref, wk2_ref, wv2_ref, wm2_ref, sa_ref, ba_ref,
                      w0a_ref, w0b_ref, w2_ref, sb_ref, bb_ref,
                      mask_ref, gout_ref,
                      gx_ref, gt_ref,
                      gwq1_ref, gwk1_ref, gwv1_ref, gwm1_ref, gs1_ref,
                      gb1_ref,
                      gwq2_ref, gwk2_ref, gwv2_ref, gwm2_ref, gsa_ref,
                      gba_ref, gw0a_ref, gw0b_ref, gw2_ref, gsb_ref, gbb_ref,
                      *, inv_sqrt_c, with_mask):
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    dt = x_ref.dtype

    # ---- recompute: self layer (fp32 math, mirroring _bwd_kernel) ----
    x = x_ref[0, 0].astype(jnp.float32)
    wq1 = wq1_ref[:].astype(jnp.float32)
    wk1 = wk1_ref[:].astype(jnp.float32)
    wv1 = wv1_ref[:].astype(jnp.float32)
    wm1 = wm1_ref[:].astype(jnp.float32)
    q1 = jnp.dot(x, wq1, preferred_element_type=jnp.float32)
    k1 = jnp.dot(x, wk1, preferred_element_type=jnp.float32)
    v1 = jnp.dot(x, wv1, preferred_element_type=jnp.float32)
    s1s = jax.lax.dot_general(
        q1, k1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_c
    if with_mask:
        s1s = s1s + mask_ref[0]
    smax1 = jnp.max(s1s, axis=-1, keepdims=True)
    p1 = jnp.exp(s1s - smax1)
    p1 = p1 / jnp.sum(p1, axis=-1, keepdims=True)
    o1 = jnp.dot(p1, v1, preferred_element_type=jnp.float32)
    m1 = jnp.dot(o1, wm1, preferred_element_type=jnp.float32)
    mu1 = jnp.mean(m1, axis=-1, keepdims=True)
    var1 = jnp.mean(jnp.square(m1 - mu1), axis=-1, keepdims=True)
    inv1 = jax.lax.rsqrt(var1 + _EPS)
    xh1 = (m1 - mu1) * inv1
    msg1 = xh1 * s1_ref[:] + b1_ref[:]
    # x1 as the forward produced it (round-trip through storage dtype)
    x1 = (x_ref[0, 0] + msg1.astype(dt)).astype(jnp.float32)

    # ---- recompute: cross attention + FFN (mirrors _ffn_bwd_kernel) ----
    t = t_ref[0, 0].astype(jnp.float32)
    q2, k2, v2, p2, o2, inv2m, xh2m, msg2 = _attention_message(
        x1, t, wq2_ref, wk2_ref, wv2_ref, wm2_ref, sa_ref, ba_ref, mask_ref,
        inv_sqrt_c=inv_sqrt_c, with_mask=with_mask,
    )
    w0a = w0a_ref[:].astype(jnp.float32)
    w0b = w0b_ref[:].astype(jnp.float32)
    w2 = w2_ref[:].astype(jnp.float32)
    u = (jnp.dot(x1, w0a, preferred_element_type=jnp.float32)
         + jnp.dot(msg2, w0b, preferred_element_type=jnp.float32))
    z = jnp.dot(_gelu_exact(u), w2, preferred_element_type=jnp.float32)
    mu3 = jnp.mean(z, axis=-1, keepdims=True)
    var3 = jnp.mean(jnp.square(z - mu3), axis=-1, keepdims=True)
    inv3 = jax.lax.rsqrt(var3 + _EPS)
    xh3 = (z - mu3) * inv3

    g = gout_ref[0, 0].astype(jnp.float32)

    # ---- backward: LN2c + FFN ----
    gsb_c = jnp.sum(g * xh3, axis=0)
    gbb_c = jnp.sum(g, axis=0)
    gxh3 = g * sb_ref[:]
    gz = inv3 * (
        gxh3
        - jnp.mean(gxh3, axis=-1, keepdims=True)
        - xh3 * jnp.mean(gxh3 * xh3, axis=-1, keepdims=True)
    )
    y = _gelu_exact(u)
    gw2_c = jax.lax.dot_general(
        y, gz, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gy = jax.lax.dot_general(
        gz, w2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gu = gy * _gelu_grad(u)
    gw0a_c = jax.lax.dot_general(
        x1, gu, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gw0b_c = jax.lax.dot_general(
        msg2, gu, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gx1 = g + jax.lax.dot_general(  # residual + FFN input path
        gu, w0a, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gmsg2 = jax.lax.dot_general(
        gu, w0b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # ---- backward: LN1c + cross attention ----
    gsa_c = jnp.sum(gmsg2 * xh2m, axis=0)
    gba_c = jnp.sum(gmsg2, axis=0)
    gxh2 = gmsg2 * sa_ref[:]
    dm2 = inv2m * (
        gxh2
        - jnp.mean(gxh2, axis=-1, keepdims=True)
        - xh2m * jnp.mean(gxh2 * xh2m, axis=-1, keepdims=True)
    )
    wm2 = wm2_ref[:].astype(jnp.float32)
    go2 = jax.lax.dot_general(
        dm2, wm2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwm2_c = jax.lax.dot_general(
        o2, dm2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gp2 = jax.lax.dot_general(
        go2, v2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gv2 = jax.lax.dot_general(
        p2, go2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds2 = p2 * (gp2 - jnp.sum(gp2 * p2, axis=-1, keepdims=True))
    gq2 = jnp.dot(ds2, k2, preferred_element_type=jnp.float32) * inv_sqrt_c
    gk2 = jax.lax.dot_general(
        ds2, q2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_c
    wq2 = wq2_ref[:].astype(jnp.float32)
    wk2 = wk2_ref[:].astype(jnp.float32)
    wv2 = wv2_ref[:].astype(jnp.float32)
    gx1 = gx1 + jax.lax.dot_general(
        gq2, wq2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gt = (
        jax.lax.dot_general(gk2, wk2,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(gv2, wv2,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    )
    gwq2_c = jax.lax.dot_general(
        x1, gq2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwk2_c = jax.lax.dot_general(
        t, gk2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwv2_c = jax.lax.dot_general(
        t, gv2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # ---- backward: LN1s + self attention (source == target == x) ----
    gs1_c = jnp.sum(gx1 * xh1, axis=0)
    gb1_c = jnp.sum(gx1, axis=0)
    gxh1 = gx1 * s1_ref[:]
    dm1 = inv1 * (
        gxh1
        - jnp.mean(gxh1, axis=-1, keepdims=True)
        - xh1 * jnp.mean(gxh1 * xh1, axis=-1, keepdims=True)
    )
    go1 = jax.lax.dot_general(
        dm1, wm1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwm1_c = jax.lax.dot_general(
        o1, dm1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gp1 = jax.lax.dot_general(
        go1, v1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gv1 = jax.lax.dot_general(
        p1, go1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds1 = p1 * (gp1 - jnp.sum(gp1 * p1, axis=-1, keepdims=True))
    gq1 = jnp.dot(ds1, k1, preferred_element_type=jnp.float32) * inv_sqrt_c
    gk1 = jax.lax.dot_general(
        ds1, q1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_c
    gx = gx1 + jnp.dot(gq1, wq1.T, preferred_element_type=jnp.float32)
    gx = gx + jnp.dot(gk1, wk1.T, preferred_element_type=jnp.float32)
    gx = gx + jnp.dot(gv1, wv1.T, preferred_element_type=jnp.float32)
    gwq1_c = jax.lax.dot_general(
        x, gq1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwk1_c = jax.lax.dot_general(
        x, gk1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gwv1_c = jax.lax.dot_general(
        x, gv1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    gx_ref[0, 0] = gx.astype(gx_ref.dtype)
    gt_ref[0, 0] = gt.astype(gt_ref.dtype)

    @pl.when(first)
    def _():
        for ref in (gwq1_ref, gwk1_ref, gwv1_ref, gwm1_ref, gs1_ref, gb1_ref,
                    gwq2_ref, gwk2_ref, gwv2_ref, gwm2_ref, gsa_ref, gba_ref,
                    gw0a_ref, gw0b_ref, gw2_ref, gsb_ref, gbb_ref):
            ref[:] = jnp.zeros_like(ref)

    gwq1_ref[:] += gwq1_c
    gwk1_ref[:] += gwk1_c
    gwv1_ref[:] += gwv1_c
    gwm1_ref[:] += gwm1_c
    gs1_ref[:] += gs1_c
    gb1_ref[:] += gb1_c
    gwq2_ref[:] += gwq2_c
    gwk2_ref[:] += gwk2_c
    gwv2_ref[:] += gwv2_c
    gwm2_ref[:] += gwm2_c
    gsa_ref[:] += gsa_c
    gba_ref[:] += gba_c
    gw0a_ref[:] += gw0a_c
    gw0b_ref[:] += gw0b_c
    gw2_ref[:] += gw2_c
    gsb_ref[:] += gsb_c
    gbb_ref[:] += gbb_c


def _block_specs(x, w0a, mask):
    b, k2, tok, c = x.shape
    f = w0a.shape[-1]
    with_mask = mask.shape[-1] == tok
    win = pl.BlockSpec((1, 1, tok, c), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    wcc = pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    wcf = pl.BlockSpec((c, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    wfc = pl.BlockSpec((f, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    if with_mask:
        msk = pl.BlockSpec((1, tok, tok), lambda i, j: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    else:
        msk = pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [win, win,
                wcc, wcc, wcc, wcc, vec, vec,
                wcc, wcc, wcc, wcc, vec, vec,
                wcf, wcf, wfc, vec, vec,
                msk]
    return with_mask, in_specs, dict(win=win, wcc=wcc, wcf=wcf, wfc=wfc,
                                     vec=vec)


def _block_forward_pallas(args):
    x = args[0]
    b, k2, tok, c = x.shape
    with_mask, in_specs, _ = _block_specs(x, args[14], args[19])
    kernel = functools.partial(_block_kernel, inv_sqrt_c=1.0 / (c**0.5),
                               with_mask=with_mask)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, k2),
        in_specs=in_specs,
        out_specs=in_specs[0],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _block_backward_pallas(res, gout):
    x, t = res[0], res[1]
    b, k2, tok, c = x.shape
    f = res[14].shape[-1]
    with_mask, in_specs, sp = _block_specs(x, res[14], res[19])
    kernel = functools.partial(_block_bwd_kernel, inv_sqrt_c=1.0 / (c**0.5),
                               with_mask=with_mask)
    f32 = jnp.float32
    cc = jax.ShapeDtypeStruct((c, c), f32)
    vv = jax.ShapeDtypeStruct((c,), f32)
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(t.shape, t.dtype),
            cc, cc, cc, cc, vv, vv,
            cc, cc, cc, cc, vv, vv,
            jax.ShapeDtypeStruct((c, f), f32),
            jax.ShapeDtypeStruct((c, f), f32),
            jax.ShapeDtypeStruct((f, c), f32),
            vv, vv,
        ),
        grid=(b, k2),
        in_specs=in_specs + [sp["win"]],
        out_specs=(sp["win"], sp["win"],
                   sp["wcc"], sp["wcc"], sp["wcc"], sp["wcc"], sp["vec"],
                   sp["vec"],
                   sp["wcc"], sp["wcc"], sp["wcc"], sp["wcc"], sp["vec"],
                   sp["vec"],
                   sp["wcf"], sp["wcf"], sp["wfc"], sp["vec"], sp["vec"]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(*res, gout)
    gx, gt = outs[0], outs[1]
    grads = [g.astype(r.dtype) for g, r in zip(outs[2:], res[2:19])]
    return (gx, gt, *grads, jnp.zeros_like(res[19]))


@jax.custom_vjp
def _fused_block(*args):
    return _block_forward_pallas(args)


def _fused_block_fwd(*args):
    return _block_forward_pallas(args), args


_fused_block.defvjp(_fused_block_fwd,
                    lambda res, g: _block_backward_pallas(res, g))


def fused_window_attention_block(
    x: jnp.ndarray,
    t: jnp.ndarray,
    self_params: dict,
    cross_params: dict,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Whole self+cross+FFN TransformerBlock per window, one kernel call.

    x, t: [B, K2, T, C] pre-split windows (both already rolled if shifted);
    self_params: dict(wq, wk, wv, wm, s1, b1); cross_params additionally
    w0 [2C, F] (split internally), w2 [F, C], s2, b2. mask: [K2, T, T] or
    None — applied to BOTH layers (reference uses the same shifted mask).
    """
    c = x.shape[-1]
    if mask is None:
        mask = jnp.zeros((1, 1, 1), jnp.float32)
    s, cr = self_params, cross_params
    return _fused_block(
        x, t,
        s["wq"], s["wk"], s["wv"], s["wm"],
        s["s1"].astype(jnp.float32), s["b1"].astype(jnp.float32),
        cr["wq"], cr["wk"], cr["wv"], cr["wm"],
        cr["s1"].astype(jnp.float32), cr["b1"].astype(jnp.float32),
        cr["w0"][:c], cr["w0"][c:], cr["w2"],
        cr["s2"].astype(jnp.float32), cr["b2"].astype(jnp.float32),
        mask.astype(jnp.float32),
    )
