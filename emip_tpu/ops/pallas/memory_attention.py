"""Fused LTM memory-read attention: softmax over time x space in VMEM.

The space-time-memory read (reference LTM.py:44-68 ``Memory.forward``)
is ``softmax(mk @ qk^T / sqrt(C), over THW) @ mv``: with a 5-slot memory
at 512^2 streaming shapes that is a [B, 20480, 4096] score/probability
pair — ~335 MB each in fp32 — materialized twice per frame by the XLA
einsum-softmax-einsum chain. This kernel computes q-row tiles of the
scores in VMEM, adds the slot-validity bias, softmaxes and contracts with
the values immediately, so only the [B, HW, Cv] result touches HBM.

Unlike :func:`emip_tpu.ops.pallas.corr_softmax.fused_flow_attention`,
query and key lengths differ (HW vs THW) and an additive per-key bias
carries the ring buffer's validity mask (-1e9 on empty slots).

The backward is flash-style (probabilities recomputed per row tile in
VMEM); dk/dv accumulate across row tiles in VMEM-resident output blocks.
The bias is a constant mask and receives zero gradient. Interpreter mode
covers non-TPU backends (tests run the same code path on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["masked_memory_attention"]

_VMEM_LIMIT = 100 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_tile(m: int, n: int, budget_bytes: int) -> int:
    """Largest 8-multiple divisor of m whose [tile, n] fp32 block fits."""
    best = m
    for tile in (1024, 512, 256, 176, 128, 88, 64, 32, 16, 8):
        if m % tile == 0:
            best = tile
            if tile * n * 4 <= budget_bytes:
                return tile
    return best


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale):
    q = q_ref[0]          # [TILE_M, C] native dtype
    k = k_ref[0]          # [N, C]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    # bias block is [1, 1, N]; [1, N] broadcasts over the row tile.
    scores = scores + bias_ref[0]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p.astype(q.dtype), v_ref[0],
                  preferred_element_type=jnp.float32)
    out_ref[0] = out / s


@jax.custom_vjp
def masked_memory_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            bias: jnp.ndarray) -> jnp.ndarray:
    """softmax(q k^T / sqrt(C) + bias, axis=-1) @ v, scores kept in VMEM.

    q: [B, M, C]; k: [B, N, C]; v: [B, N, D]; bias: [B, N] additive (use
    -1e9 to mask empty memory slots). Returns [B, M, D] fp32.
    """
    return _fwd_impl(q, k, v, bias)


def _fwd_impl(q, k, v, bias):
    b, m, c = q.shape
    n = k.shape[1]
    d = v.shape[-1]
    tile = _row_tile(m, n, 24 * 1024 * 1024)
    kernel = functools.partial(_fwd_kernel, scale=1.0 / (c**0.5))
    # Mosaic requires the last two block dims to be (8,128)-divisible or
    # equal to the array dims; a [B, N] bias with block (1, n) violates
    # that for B > 1 (sublane dim 1 != B).  Carry it as [B, 1, N] with a
    # (1, 1, n) block: sublane 1 == array dim 1, lane n == array dim n.
    bias3 = bias.reshape(b, 1, n)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, m, d), jnp.float32),
        grid=(b, m // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(q, k, v, bias3)


def _fwd(q, k, v, bias):
    out = _fwd_impl(q, k, v, bias)
    return out, (q, k, v, bias, out)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, out_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    first_tile = pl.program_id(1) == 0

    q = q_ref[0].astype(jnp.float32)   # [TILE_M, C]
    k = k_ref[0].astype(jnp.float32)   # [N, C]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    scores = scores + bias_ref[0]      # [1, N] broadcasts over rows
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [TILE_M, N]

    g = g_ref[0].astype(jnp.float32)   # [TILE_M, D]
    v = v_ref[0].astype(jnp.float32)   # [N, D]
    gv = jax.lax.dot_general(          # g @ v^T -> [TILE_M, N]
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    inner = jnp.sum(g * out_ref[0], axis=-1, keepdims=True)
    ds = p * (gv - inner)              # [TILE_M, N]

    dq_ref[0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)
    dk_contrib = jax.lax.dot_general(  # ds^T @ q -> [N, C]
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dv_contrib = jax.lax.dot_general(  # p^T @ g -> [N, D]
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(first_tile)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_contrib.astype(dk_ref.dtype)
    dv_ref[0] += dv_contrib.astype(dv_ref.dtype)


def _bwd(res, g):
    q, k, v, bias, out = res
    b, m, c = q.shape
    n = k.shape[1]
    d = v.shape[-1]
    # backward holds ~3 [tile, N] fp32 tensors in VMEM — budget each small
    tile = _row_tile(m, n, 8 * 1024 * 1024)
    kernel = functools.partial(_bwd_kernel, scale=1.0 / (c**0.5))
    bias3 = bias.reshape(b, 1, n)      # see _fwd_impl: (1, n) block illegal for B>1
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, n, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        ),
        grid=(b, m // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(q, k, v, bias3, g, out)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), jnp.zeros_like(bias)


masked_memory_attention.defvjp(_fwd, _bwd)
