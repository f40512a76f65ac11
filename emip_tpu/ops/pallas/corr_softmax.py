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

Both ops carry a custom VJP whose backward is itself a Pallas kernel
(flash-attention style): probabilities are recomputed per row-tile in VMEM
and contracted immediately, so the [B, M, N] probability/score tensors
never touch HBM in backward either. Value/key gradients accumulate across
row-tiles in a VMEM-resident output block (the TPU grid is sequential, so
revisited output blocks act as accumulators).

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

# v5e VMEM is 128MB; the default 16MB scoped limit rejects the 512^2
# shapes (n=4096: an 8MB corr row-block double-buffered + in-kernel exp
# scratch). Same raised limit as memory_attention.py.
_VMEM_LIMIT = 100 * 1024 * 1024


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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(corr, values)


def _softmax_expectation_fwd(corr, values):
    out = _softmax_expectation_fwd_impl(corr, values)
    return out, (corr, values, out)


def _softmax_expectation_bwd_kernel(corr_ref, values_ref, g_ref, out_ref,
                                    dcorr_ref, dvalues_ref):
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    logits = corr_ref[0].astype(jnp.float32)  # [TILE_M, N]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    g = g_ref[0].astype(jnp.float32)      # [TILE_M, D]
    vals = values_ref[:].astype(jnp.float32)  # [N, D]
    gv = jax.lax.dot_general(             # g @ vals^T -> [TILE_M, N]
        g, vals, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    inner = jnp.sum(g * out_ref[0], axis=-1, keepdims=True)
    dcorr_ref[0] = (p * (gv - inner)).astype(dcorr_ref.dtype)

    contrib = jax.lax.dot_general(        # p^T @ g -> [N, D]
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(first)
    def _():
        dvalues_ref[:] = jnp.zeros_like(dvalues_ref)

    dvalues_ref[:] += contrib


def _softmax_expectation_bwd(res, g):
    corr, values, out = res
    b, m, n = corr.shape
    d = values.shape[-1]
    tile = _row_tile(m)
    dcorr, dvalues = pl.pallas_call(
        _softmax_expectation_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(corr.shape, corr.dtype),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
        ),
        grid=(b, m // tile),
        in_specs=[
            pl.BlockSpec((1, tile, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(corr, values, g, out)
    return dcorr, dvalues.astype(values.dtype)


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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(q, k, v)


def _flow_attention_fwd(q, k, v):
    out = _flow_attention_fwd_impl(q, k, v)
    return out, (q, k, v, out)


def _flow_attention_bwd_kernel(q_ref, k_ref, v_ref, g_ref, out_ref,
                               dq_ref, dk_ref, dv_ref, *, scale):
    first_tile = pl.program_id(1) == 0

    q = q_ref[0].astype(jnp.float32)  # [TILE_M, C]
    k = k_ref[0].astype(jnp.float32)  # [L, C]
    scores = jax.lax.dot_general(     # q @ k^T
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [TILE_M, L]

    g = g_ref[0].astype(jnp.float32)  # [TILE_M, D]
    v = v_ref[0].astype(jnp.float32)  # [L, D]
    gv = jax.lax.dot_general(         # g @ v^T -> [TILE_M, L]
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    inner = jnp.sum(g * out_ref[0], axis=-1, keepdims=True)
    ds = p * (gv - inner)             # [TILE_M, L]

    dq_ref[0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)
    dk_contrib = jax.lax.dot_general(  # ds^T @ q -> [L, C]
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dv_contrib = jax.lax.dot_general(  # p^T @ g -> [L, D]
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(first_tile)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_contrib.astype(dk_ref.dtype)
    dv_ref[0] += dv_contrib.astype(dv_ref.dtype)


def _flow_attention_bwd(res, g):
    q, k, v, out = res
    b, l, c = q.shape
    d = v.shape[-1]
    # backward holds ~4 [tile, L] tensors in VMEM — use the small tile
    tile = _row_tile(l)
    kernel = functools.partial(_flow_attention_bwd_kernel,
                               scale=1.0 / (c**0.5))
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, l, c), jnp.float32),
            jax.ShapeDtypeStruct((b, l, d), jnp.float32),
        ),
        grid=(b, l // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(q, k, v, g, out)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


fused_flow_attention.defvjp(_flow_attention_fwd, _flow_attention_bwd)
