"""Fused depthwise-conv + GELU kernel for the PVTv2 MixFFN.

The reference MixFFN (lib/pvt_v2.py:15-54) is fc1 -> 3x3 depthwise conv ->
GELU -> fc2. The two big matmuls are near-peak in XLA; the dwconv and GELU
between them each round-trip the [H*W, 4C] hidden through HBM (~20 MB per
stage-3 block at 352^2/bs=8). This kernel fuses dwconv+bias+GELU into ONE
read + ONE write, operating directly on the flat [H*W, F] token layout —
no [H, W, F] relayout (a full fc1+dw+gelu+fc2 fusion with an in-kernel
reshape was measured SLOWER end-to-end: 195 vs 230 frames/s):

  * a dx = +-1 column shift is a +-1 sublane shift with the row-wrap
    contamination masked off via iota % W;
  * a dy = +-1 row shift is a +-W sublane shift (zero padded at the ends).

Backward recomputes the conv pre-activation per cell and emits the input
grad plus tap/bias grads accumulated across the grid. Exact-erf GELU via
Abramowitz-Stegun (Mosaic has no erf lowering). On non-TPU backends both
kernels run in interpreter mode (tests cover them on CPU).

``dwconv_gelu_bwd_fused`` is the HYBRID form (round-5): forward stays in
XLA (which fuses the fwd chain well — the all-Pallas fwd measured 170 vs
230 f/s in r2), but the BACKWARD is the fused kernel above, cutting the
segment's HBM passes from ~10 to 3 with the pre-activation recomputed in
VMEM. MEASURED A DEAD END as the production default: stage-3 grad micro
32.98 vs 14.96 ms (tools/bench_mixffn_micro.py, v5e) — the in-kernel
wrap-masked sublane-shift dwconv costs ~4x what it saves in HBM traffic
(XLA's backward for this segment already runs at ~HBM bandwidth: the
5.8 ms `ffn - mm` gap matches a ~12-pass traffic estimate). Kept behind
``MixFFN(dwconv_impl="bwd_fused")`` / ``EMIP_FFN_DWCONV`` for shapes
where XLA's dwconv backward might regress.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emip_tpu.ops.pallas.window_attention import _gelu_exact, _gelu_grad

__all__ = ["fused_dwconv_gelu", "dwconv_gelu_bwd_fused"]


def _poly_gelu_grad(d):
    from emip_tpu.ops.gelu import gelu_poly_grad

    return gelu_poly_grad(d)


# kernel-side gradient of each MixFFN gelu_impl, applied to the fp32
# VMEM-recomputed pre-activation (fp32 recompute deliberately: r2 measured
# bf16 flash-style recompute neutral in speed, worse in grad precision)
_GELU_GRADS = {
    "exact": _gelu_grad,
    "poly": _poly_gelu_grad,
    "poly_native": _poly_gelu_grad,
}

_VMEM_LIMIT = 100 * 1024 * 1024  # scoped-vmem cap; v5e physical VMEM is 128M


def _col_masks(hw: int, w: int):
    """[HW, 1] masks zeroing tokens whose dx-shift wrapped a row edge."""
    col = lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % w
    left_ok = (col != 0).astype(jnp.float32)       # dx=-1 invalid at col 0
    right_ok = (col != w - 1).astype(jnp.float32)  # dx=+1 invalid at col W-1
    return left_ok, right_ok


def _conv_flat(u, wdw_ref, bdw_ref, hw: int, w: int):
    """Cross-correlation dwconv on flat tokens: d[i] = sum w[dy,dx] u[i+dy*W+dx]."""
    pad = w + 1
    up = jnp.pad(u, ((pad, pad), (0, 0)))
    left_ok, right_ok = _col_masks(hw, w)
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            tap = wdw_ref[dy + 1, dx + 1].astype(jnp.float32)
            sl = up[pad + dy * w + dx : pad + dy * w + dx + hw]
            term = sl.astype(jnp.float32) * tap
            if dx == 1:
                term = term * right_ok
            elif dx == -1:
                term = term * left_ok
            acc = term if acc is None else acc + term
    return acc + bdw_ref[:]


def _conv_flat_T(g, wdw_ref, hw: int, w: int):
    """Transpose w.r.t. input: gu[i] = sum w[dy,dx] g_masked[i - dy*W - dx]."""
    left_ok, right_ok = _col_masks(hw, w)
    pad = w + 1
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            tap = wdw_ref[dy + 1, dx + 1].astype(jnp.float32)
            gm = g
            if dx == 1:
                gm = g * right_ok
            elif dx == -1:
                gm = g * left_ok
            gp = jnp.pad(gm, ((pad, pad), (0, 0)))
            sl = gp[pad - dy * w - dx : pad - dy * w - dx + hw]
            term = sl * tap
            acc = term if acc is None else acc + term
    return acc


def _fwd_kernel(u_ref, wdw_ref, bdw_ref, out_ref, *, hw, w):
    d = _conv_flat(u_ref[0], wdw_ref, bdw_ref, hw, w)
    out_ref[0] = _gelu_exact(d).astype(out_ref.dtype)


def _bwd_kernel(u_ref, wdw_ref, bdw_ref, gout_ref,
                gu_ref, gwdw_ref, gbdw_ref, *, hw, w,
                gelu_grad=_gelu_grad):
    first = pl.program_id(0) == 0
    u = u_ref[0].astype(jnp.float32)
    d = _conv_flat(u_ref[0], wdw_ref, bdw_ref, hw, w)
    gd = gout_ref[0].astype(jnp.float32) * gelu_grad(d)

    gbdw_c = jnp.sum(gd, axis=0)
    gu = _conv_flat_T(gd, wdw_ref, hw, w)
    gu_ref[0] = gu.astype(gu_ref.dtype)

    # tap grads: gw[dy,dx] = sum_i u[i + dy*W + dx] * gd_masked[i]
    left_ok, right_ok = _col_masks(hw, w)
    pad = w + 1
    up = jnp.pad(u, ((pad, pad), (0, 0)))
    rows = []
    for dy in (-1, 0, 1):
        row = []
        for dx in (-1, 0, 1):
            gm = gd
            if dx == 1:
                gm = gd * right_ok
            elif dx == -1:
                gm = gd * left_ok
            sl = up[pad + dy * w + dx : pad + dy * w + dx + hw]
            row.append(jnp.sum(sl * gm, axis=0))
        rows.append(jnp.stack(row, axis=0))
    gwdw_c = jnp.stack(rows, axis=0)

    @pl.when(first)
    def _():
        gwdw_ref[:] = jnp.zeros_like(gwdw_ref)
        gbdw_ref[:] = jnp.zeros_like(gbdw_ref)

    gwdw_ref[:] += gwdw_c
    gbdw_ref[:] += gbdw_c


def _specs(u, wdw):
    n, hw, f = u.shape
    tok = pl.BlockSpec((1, hw, f), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((3, 3, f), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    vf = pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM)
    return tok, wspec, vf


def _forward_pallas(u, wdw, bdw, hw, w):
    n = u.shape[0]
    tok, wspec, vf = _specs(u, wdw)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hw=hw, w=w),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=(n,),
        in_specs=[tok, wspec, vf],
        out_specs=tok,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )(u, wdw, bdw)


def _backward_pallas(res, gout, gelu_grad=_gelu_grad):
    u, wdw, bdw, hw, w = res
    n, _, f = u.shape
    tok, wspec, vf = _specs(u, wdw)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, hw=hw, w=w, gelu_grad=gelu_grad),
        out_shape=(
            jax.ShapeDtypeStruct(u.shape, u.dtype),
            jax.ShapeDtypeStruct((3, 3, f), jnp.float32),
            jax.ShapeDtypeStruct((f,), jnp.float32),
        ),
        grid=(n,),
        in_specs=[tok, wspec, vf, tok],
        out_specs=(tok, wspec, vf),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )(u, wdw, bdw, gout)
    gu, gwdw, gbdw = outs
    return gu, gwdw.astype(wdw.dtype), gbdw.astype(bdw.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused(u, wdw, bdw, hw, w):
    return _forward_pallas(u, wdw, bdw, hw, w)


def _fused_fwd(u, wdw, bdw, hw, w):
    return _forward_pallas(u, wdw, bdw, hw, w), (u, wdw, bdw, hw, w)


def _fused_bwd(hw, w, res, g):
    return _backward_pallas(res, g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_dwconv_gelu(
    u: jnp.ndarray,
    wdw: jnp.ndarray,
    bdw: jnp.ndarray,
    h: int,
    w: int,
) -> jnp.ndarray:
    """gelu(dwconv3x3(u) + b) on flat tokens u: [N, H*W, F]; wdw [3,3,F]."""
    return _fused(u, wdw, bdw.astype(jnp.float32), h * w, w)


def _xla_fwd(u, wdw, bdw, hw, w, gelu):
    """XLA forward: grouped conv + bias + gelu, same math as the MixFFN
    nn.Conv path (reference lib/pvt_v2.py:36-44 DWConv.forward)."""
    n, _, f = u.shape
    h = hw // w
    x = u.reshape(n, h, w, f)
    k = wdw.reshape(3, 3, 1, f).astype(u.dtype)
    d = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=f,
    ) + bdw.astype(u.dtype)
    if gelu == "poly":
        from emip_tpu.ops.gelu import gelu_poly

        y = gelu_poly(d)
    elif gelu == "poly_native":
        from emip_tpu.ops.gelu import gelu_poly_native

        y = gelu_poly_native(d)
    else:
        import flax.linen as nn

        y = nn.gelu(d, approximate=False)
    return y.reshape(n, hw, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _hybrid(u, wdw, bdw, hw, w, gelu):
    return _xla_fwd(u, wdw, bdw, hw, w, gelu)


def _hybrid_fwd(u, wdw, bdw, hw, w, gelu):
    return _xla_fwd(u, wdw, bdw, hw, w, gelu), (u, wdw, bdw, hw, w)


def _hybrid_bwd(hw, w, gelu, res, g):
    return _backward_pallas(res, g, gelu_grad=_GELU_GRADS[gelu])


_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


def dwconv_gelu_bwd_fused(
    u: jnp.ndarray,
    wdw: jnp.ndarray,
    bdw: jnp.ndarray,
    h: int,
    w: int,
    gelu: str = "exact",
) -> jnp.ndarray:
    """gelu(dwconv3x3(u) + b): XLA forward, fused Pallas backward.

    u flat tokens [N, H*W, F]; wdw [3,3,F]. The backward kernel recomputes
    the conv pre-activation in VMEM and emits input/tap/bias grads in one
    pass — replacing XLA's ~10 HBM round-trips for this segment's VJP
    under remat. ``gelu`` selects the in-kernel gradient to match the
    forward ("exact" | "poly" | "poly_native").
    """
    return _hybrid(u, wdw, bdw.astype(jnp.float32), h * w, w, gelu)
