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
shifted-window roll also stays outside). The backward pass recomputes with
plain XLA ops via custom_vjp, so the kernel is train-safe. On non-TPU
backends it runs in interpreter mode (tests cover it on CPU).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_window_attention_layer"]

_EPS = 1e-6  # flax LayerNorm default epsilon


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


def _forward_pallas(x, t, wq, wk, wv, wm, scale, bias, mask, add_residual):
    b, k2, tok, c = x.shape
    # a real mask is [K2, T, T]; the no-mask placeholder is [1, 1, 1]
    with_mask = mask.shape[-1] == tok

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
        interpret=jax.default_backend() != "tpu",
    )(x, t, wq, wk, wv, wm, scale, bias, mask)


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
        has_mask = mask.ndim == 3 and mask.shape[-1] == x.shape[2]

        def ref(x, t, wq, wk, wv, wm, scale, bias, mask):
            return _xla_reference(x, t, wq, wk, wv, wm, scale, bias,
                                  mask if has_mask else None, add_residual)

        _, vjp = jax.vjp(ref, x, t, wq, wk, wv, wm, scale, bias, mask)
        return vjp(g)

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
