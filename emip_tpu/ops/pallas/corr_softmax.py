"""Pallas TPU kernels: fused softmax-expectation and flow attention.

The flow engine's two memory hogs at 44x44 resolution are [B, 1936, 1936]
score/probability tensors (SURVEY.md §8 "hard parts"):

  * global matching: softmax(corr) @ grid for both directions
    (reference matching.py:34-36) — XLA materializes the [B, HW, HW]
    probabilities in HBM;
  * flow propagation: softmax(q k^T / sqrt(c)) @ flow
    (reference transformer.py:528-531) — materializes scores AND probs.

Both are "softmax of a big matrix contracted with a skinny value matrix".
These kernels keep the probabilities in VMEM: a row-tile of scores is
computed (or streamed), softmaxed, and immediately contracted with the
value matrix, so only the [B, M, D] result (D = 2 for flow) ever touches
HBM. At train batch 6 this removes ~360MB of HBM traffic per step from the
propagation attention alone.

Both ops carry a custom VJP whose backward recomputes the probabilities
with plain XLA ops (memory profile equal to the unfused baseline, but only
during backward), so the kernels are usable in training too.

On non-TPU backends the kernels run in interpreter mode (tests exercise the
same code path on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["softmax_expectation", "fused_flow_attention"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_tile(m: int) -> int:
    """Largest divisor of m that is a multiple of 8 and <= ~512.

    Tiles must be 8-divisible (TPU sublane rule). 1936's usable divisors
    are {176, 968}; 968 OOMs scoped VMEM (double-buffered fp32 blocks), so
    176 is the sweet spot for the 44x44 resolution.
    """
    for tile in (512, 256, 176, 128, 88, 64, 32, 16, 8):
        if m % tile == 0:
            return tile
    return m


# ------------------------------------------------- softmax @ values


def _softmax_expectation_kernel(corr_ref, values_ref, out_ref):
    logits = corr_ref[0].astype(jnp.float32)  # [TILE_M, N]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p, values_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    out_ref[0] = out / s


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def softmax_expectation(corr: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """softmax(corr, axis=-1) @ values without materializing the probs.

    corr: [B, M, N]; values: [N, D]. Returns [B, M, D] (fp32).
    """
    return _softmax_expectation_fwd_impl(corr, values)


def _softmax_expectation_fwd_impl(corr, values):
    b, m, n = corr.shape
    d = values.shape[-1]
    tile = _row_tile(m)
    return pl.pallas_call(
        _softmax_expectation_kernel,
        out_shape=jax.ShapeDtypeStruct((b, m, d), jnp.float32),
        grid=(b, m // tile),
        in_specs=[
            pl.BlockSpec((1, tile, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(corr, values)


def _softmax_expectation_fwd(corr, values):
    out = _softmax_expectation_fwd_impl(corr, values)
    return out, (corr, values, out)


def _softmax_expectation_bwd(res, g):
    corr, values, out = res
    # recompute probs with XLA (backward-only memory, like the baseline)
    p = jax.nn.softmax(corr.astype(jnp.float32), axis=-1)
    gv = jnp.einsum("bmd,nd->bmn", g.astype(jnp.float32),
                    values.astype(jnp.float32))
    inner = jnp.sum(g.astype(jnp.float32) * out, axis=-1, keepdims=True)
    d_corr = (p * (gv - inner)).astype(corr.dtype)
    d_values = jnp.einsum("bmn,bmd->nd", p, g.astype(jnp.float32)).astype(
        values.dtype
    )
    return d_corr, d_values


softmax_expectation.defvjp(_softmax_expectation_fwd, _softmax_expectation_bwd)


# ------------------------------------------------- fused flow attention


def _flow_attention_kernel(q_ref, k_ref, v_ref, out_ref, *, scale):
    q = q_ref[0]  # [TILE_M, C] — native dtype, MXU matmul, fp32 accumulation
    k = k_ref[0]  # [L, C]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p, v_ref[0].astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    out_ref[0] = out / s


@jax.custom_vjp
def fused_flow_attention(q: jnp.ndarray, k: jnp.ndarray,
                         v: jnp.ndarray) -> jnp.ndarray:
    """softmax(q k^T / sqrt(C)) @ v with scores kept in VMEM.

    q, k: [B, L, C]; v: [B, L, D]. Returns [B, L, D] (fp32).
    """
    return _flow_attention_fwd_impl(q, k, v)


def _flow_attention_fwd_impl(q, k, v):
    b, l, c = q.shape
    d = v.shape[-1]
    # larger row tiles than softmax_expectation: the scores scratch here is
    # single-buffered (computed in-kernel, not an input), so 968 rows
    # (7.5MB fp32) fit scoped VMEM and quarter the grid-step count
    tile = 968 if l % 968 == 0 else _row_tile(l)
    kernel = functools.partial(_flow_attention_kernel, scale=1.0 / (c**0.5))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, d), jnp.float32),
        grid=(b, l // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(q, k, v)


def _flow_attention_fwd(q, k, v):
    out = _flow_attention_fwd_impl(q, k, v)
    return out, (q, k, v, out)


def _flow_attention_bwd(res, g):
    q, k, v, out = res
    c = q.shape[-1]
    scale = 1.0 / (c**0.5)
    scores = jnp.einsum(
        "blc,bmc->blm", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    p = jax.nn.softmax(scores, axis=-1)
    g32 = g.astype(jnp.float32)
    gv = jnp.einsum("bld,bmd->blm", g32, v.astype(jnp.float32))
    inner = jnp.sum(g32 * out, axis=-1, keepdims=True)
    d_scores = p * (gv - inner)
    dq = (jnp.einsum("blm,bmc->blc", d_scores, k.astype(jnp.float32))
          * scale).astype(q.dtype)
    dk = (jnp.einsum("blm,blc->bmc", d_scores, q.astype(jnp.float32))
          * scale).astype(k.dtype)
    dv = jnp.einsum("blm,bld->bmd", p, g32).astype(v.dtype)
    return dq, dk, dv


fused_flow_attention.defvjp(_flow_attention_fwd, _flow_attention_bwd)
