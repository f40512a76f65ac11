"""Pallas kernel for RAFT-style convex flow upsampling.

The XLA formulation (ops/upsample.py) is layout-bound: the 9-neighbour
softmax-combine produces [B, h, w, K, K, 2] that must be re-interleaved to
[B, h*K, w*K, 2] — a small-inner-dim transpose XLA executes at ~4 ms for
bs=16 @44^2 (tools: /tmp/bench_cvx.py measurements; compute is ~70 MFLOP).

This kernel grids over (batch, sub-row ky). For a fixed ky the output rows
hy*K+ky form slabs whose flattened layout [h, w*K, 2] is exactly the
contiguous reshape of the per-pixel result [h*w, K, 2] — no transpose
anywhere. The mask is pre-reshaped to [B, h*w, 9, K, K] so each grid cell
DMAs only its ky-slice.

Backward is a second flat-layout kernel over the same grid: recomputes the
softmax in VMEM and emits the mask-logit grad (p * ((nb - out) . g)) and
per-neighbour flow grads, avoiding the XLA reference VJP's materialized
[B, h, w, 9, K, K] weight tensor (~71 MB at bs=16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["convex_upsample_pallas"]


def _neighbors_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """[B, h, w, C] -> [B, h, w, 9, C] zero-padded 3x3 patches, row-major."""
    b, h, w, c = x.shape
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [
        pad[:, dy : dy + h, dx : dx + w, :]
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.stack(views, axis=3)


def _kernel(mask_ref, nbx_ref, nby_ref, outx_ref, outy_ref, *, k):
    """mask: [1, Qc, 9*KK] (channels (n, ky, kx)); nbx/nby: [1, Qc, 9].

    Everything stays in the flat [Q, lanes] layout (a [Q, 9, 64] view
    tiles as (16, 128) per (9, 64) face and blows VMEM); the 9-neighbour
    softmax-combine is static lane slices + VPU FMAs. The kernel is also
    *more accurate* than the XLA einsum lowering on TPU: measured 3.5e-5
    vs 1.3e-1 max error against an fp64 oracle at 44^2/bs=16 (XLA's
    excess-precision bf16 contraction), at 0.2-1 ms vs 4 ms.
    """
    kk = k * k

    def sl(n):
        return mask_ref[0, :, n * kk : (n + 1) * kk].astype(jnp.float32)

    m = sl(0)
    for n in range(1, 9):
        m = jnp.maximum(m, sl(n))

    denom = jnp.zeros_like(m)
    upx = jnp.zeros_like(m)
    upy = jnp.zeros_like(m)
    for n in range(9):
        e = jnp.exp(sl(n) - m)
        denom = denom + e
        upx = upx + e * nbx_ref[0][:, n : n + 1]
        upy = upy + e * nby_ref[0][:, n : n + 1]
    outx_ref[0] = upx / denom  # [Qc, KK]
    outy_ref[0] = upy / denom


def _q_chunk(q: int) -> int:
    """Largest multiple-of-8 divisor of q that is <= 968 (or q itself)."""
    if q <= 968:
        return q
    for c in range(968, 7, -1):
        if q % c == 0 and c % 8 == 0:
            return c
    return q


def _forward(flow, mask_logits, k):
    b, h, w, _ = flow.shape
    q = h * w
    qc = _q_chunk(q)
    nb = _neighbors_3x3(flow * k).reshape(b, q, 9, 2)
    mask3 = mask_logits.reshape(b, q, 9 * k * k)
    kk = k * k
    outx, outy = pl.pallas_call(
        functools.partial(_kernel, k=k),
        out_shape=(
            jax.ShapeDtypeStruct((b, q, kk), jnp.float32),
            jax.ShapeDtypeStruct((b, q, kk), jnp.float32),
        ),
        grid=(b, q // qc),
        in_specs=[
            pl.BlockSpec((1, qc, 9 * kk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qc, 9), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qc, 9), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, qc, kk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qc, kk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(mask3, nb[..., 0], nb[..., 1])
    # interleave (hy, ky) / (wx, kx); the leading-dims transpose is cheap —
    # the expensive part (softmax-combine) stayed in VMEM
    up = jnp.stack([outx, outy], axis=-1).reshape(b, h, w, k, k, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(b, h * k, w * k, 2)


def _xla_reference(flow, mask_logits, k):
    b, h, w, _ = flow.shape
    neighbors = _neighbors_3x3(flow * k)
    weights = mask_logits.reshape(b, h, w, 9, k, k).astype(jnp.float32)
    weights = jax.nn.softmax(weights, axis=3)
    up = jnp.einsum("bhwnkl,bhwnc->bhwklc", weights,
                    neighbors.astype(jnp.float32))
    up = up.transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(b, h * k, w * k, 2)


def _bwd_kernel(mask_ref, nbx_ref, nby_ref, ggx_ref, ggy_ref,
                gmask_ref, gnbx_ref, gnby_ref, *, k):
    """Per-chunk backward in the same flat [Qc, lanes] layout.

    out = sum_n p_n * nb_n  with p = softmax over n per (q, kk), so
      d nb_n   = sum_kk p_n * gg
      d s_n    = p_n * ((nbx_n - outx) * ggx + (nby_n - outy) * ggy)
    """
    kk = k * k

    def sl(n):
        return mask_ref[0, :, n * kk : (n + 1) * kk].astype(jnp.float32)

    m = sl(0)
    for n in range(1, 9):
        m = jnp.maximum(m, sl(n))
    denom = jnp.zeros_like(m)
    upx = jnp.zeros_like(m)
    upy = jnp.zeros_like(m)
    for n in range(9):
        e = jnp.exp(sl(n) - m)
        denom = denom + e
        upx = upx + e * nbx_ref[0][:, n : n + 1]
        upy = upy + e * nby_ref[0][:, n : n + 1]
    outx = upx / denom
    outy = upy / denom

    ggx = ggx_ref[0].astype(jnp.float32)  # [Qc, KK]
    ggy = ggy_ref[0].astype(jnp.float32)
    gnbx_cols = []
    gnby_cols = []
    for n in range(9):
        p = jnp.exp(sl(n) - m) / denom  # [Qc, KK]
        gnbx_cols.append(jnp.sum(p * ggx, axis=-1, keepdims=True))
        gnby_cols.append(jnp.sum(p * ggy, axis=-1, keepdims=True))
        gmask_ref[0, :, n * kk : (n + 1) * kk] = p * (
            (nbx_ref[0][:, n : n + 1] - outx) * ggx
            + (nby_ref[0][:, n : n + 1] - outy) * ggy
        )
    gnbx_ref[0] = jnp.concatenate(gnbx_cols, axis=-1)
    gnby_ref[0] = jnp.concatenate(gnby_cols, axis=-1)


def _backward(flow, mask_logits, g, k):
    b, h, w, _ = flow.shape
    q = h * w
    qc = _q_chunk(q)
    kk = k * k
    nb = _neighbors_3x3(flow * k).reshape(b, q, 9, 2)
    mask3 = mask_logits.reshape(b, q, 9 * kk)

    # invert the forward's output interleave: [B, hK, wK, 2] -> per-pixel
    gg = g.reshape(b, h, k, w, k, 2).transpose(0, 1, 3, 2, 4, 5)
    gg = gg.reshape(b, q, kk, 2)

    spec_m = pl.BlockSpec((1, qc, 9 * kk), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((1, qc, 9), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    spec_g = pl.BlockSpec((1, qc, kk), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    gmask3, gnbx, gnby = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        out_shape=(
            jax.ShapeDtypeStruct((b, q, 9 * kk), jnp.float32),
            jax.ShapeDtypeStruct((b, q, 9), jnp.float32),
            jax.ShapeDtypeStruct((b, q, 9), jnp.float32),
        ),
        grid=(b, q // qc),
        in_specs=[spec_m, spec_n, spec_n, spec_g, spec_g],
        out_specs=(spec_m, spec_n, spec_n),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(mask3, nb[..., 0], nb[..., 1], gg[..., 0], gg[..., 1])

    # transpose of the 3x3 neighbour gather (zero-padded shifts)
    gnb = jnp.stack([gnbx, gnby], axis=-1).reshape(b, h, w, 9, 2)
    gflow = None
    for n in range(9):
        dy, dx = divmod(n, 3)
        v = jnp.pad(gnb[:, :, :, n, :], ((0, 0), (1, 1), (1, 1), (0, 0)))
        term = v[:, 2 - dy : 2 - dy + h, 2 - dx : 2 - dx + w, :]
        gflow = term if gflow is None else gflow + term
    gflow = (gflow * float(k)).astype(flow.dtype)
    return gflow, gmask3.reshape(mask_logits.shape).astype(mask_logits.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def convex_upsample_pallas(flow: jnp.ndarray, mask_logits: jnp.ndarray,
                           k: int = 8) -> jnp.ndarray:
    """Convex-combination flow upsample by ``k`` (fp32 output).

    flow: [B, h, w, 2]; mask_logits: [B, h, w, 9*k*k], channels ordered
    (neighbour, sub_row, sub_col) as in the reference's F.unfold path
    (gmflow/gmflow.py:56-79).
    """
    return _forward(flow, mask_logits, k)


def _fwd(flow, mask_logits, k):
    return _forward(flow, mask_logits, k), (flow, mask_logits)


def _bwd(k, res, g):
    flow, mask_logits = res
    return _backward(flow, mask_logits, g, k)


convex_upsample_pallas.defvjp(_fwd, _bwd)
