"""Pallas kernel: bilinear forward-splat density via triangle-kernel matmul.

density[h, w] = sum_q max(0, 1-|y_q - h|) * max(0, 1-|x_q - w|) — the
occlusion-mask splat (reference loss/warp_utils.py:26-80) as an MXU
contraction: per q-chunk build hat-weight matrices A [qc, H], B [qc, W]
in VMEM and accumulate A^T B into the [H, W] density block (revisited
across the chunk grid axis, so it acts as an accumulator).

The XLA einsum version of the same math needs Precision.HIGHEST to keep
the 0.2-threshold comparison faithful, which costs ~11 ms at 352^2/bs=8;
Mosaic's native fp32 matmul is both accurate and ~4x faster.

The op is used under a hard threshold (non-differentiable consumer), but a
custom VJP via the XLA formulation keeps it safe to differentiate.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["splat_density_pallas"]


def _q_chunk(q: int) -> int:
    """Largest multiple-of-8 divisor of q <= SPLAT_QC (default 3872).

    Swept at 352^2/bs=8: qc 968/2048/3872/7744/15488 ->
    3.78/3.89/3.15/3.68/3.49 ms; 3872 amortizes grid overhead best while
    the A/B hat matrices still double-buffer (needs the raised scoped-vmem
    cap on the pallas_call).
    """
    from emip_tpu.utils.knobs import resolve

    cap = resolve("splat_q_chunk", 3872, env="SPLAT_QC")
    best = q
    for c in range(min(q, cap), 7, -1):
        if q % c == 0 and c % 8 == 0:
            return c
    return best


def _kernel(x_ref, y_ref, out_ref, *, h, w):
    first = pl.program_id(1) == 0
    x = x_ref[0, :, 0]  # [qc]
    y = y_ref[0, :, 0]
    qc = x.shape[0]
    # tpu.iota only produces integers; cast after
    rows = lax.broadcasted_iota(jnp.int32, (qc, h), 1).astype(jnp.float32)
    cols = lax.broadcasted_iota(jnp.int32, (qc, w), 1).astype(jnp.float32)
    a = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - rows))  # [qc, H]
    b = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - cols))  # [qc, W]
    contrib = lax.dot_general(  # A^T B -> [H, W]
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(first)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += contrib


def _xla_reference(coords: jnp.ndarray) -> jnp.ndarray:
    n, h, w, _ = coords.shape
    x = coords[..., 0].reshape(n, -1).astype(jnp.float32)
    y = coords[..., 1].reshape(n, -1).astype(jnp.float32)
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    a = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - rows))
    b = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - cols))
    return jnp.einsum("nqh,nqw->nhw", a, b,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


@jax.custom_vjp
def splat_density_pallas(coords: jnp.ndarray) -> jnp.ndarray:
    """coords [N, H, W, 2] of (x, y) targets -> [N, H, W] fp32 density."""
    return _forward(coords)


def _forward(coords):
    n, h, w, _ = coords.shape
    q = h * w
    qc = _q_chunk(q)
    x = coords[..., 0].reshape(n, q, 1).astype(jnp.float32)
    y = coords[..., 1].reshape(n, q, 1).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        grid=(n, q // qc),
        in_specs=[
            pl.BlockSpec((1, qc, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qc, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, y)


def _fwd(coords):
    return _forward(coords), (coords,)


def _bwd(res, g):
    (coords,) = res
    _, vjp = jax.vjp(_xla_reference, coords)
    return vjp(g)


splat_density_pallas.defvjp(_fwd, _bwd)
