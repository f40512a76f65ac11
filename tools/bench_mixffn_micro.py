#!/usr/bin/env python
"""Isolated stage-3 PVT block / MixFFN / bare-matmul grad microbench.

Answers "where does the ~15 ms/call of FFN fc-matmul time go?" by peeling
the stage-3 scan (the 40-block bulk of PVTv2-B5, reference
lib/pvt_v2.py:396-401) into nested variants, all timed fwd+grad at the
production shape (bs=8 @ 352^2 -> stage3 22x22xC320, hidden 1280):

  block     full PVTBlock scan (prod remat save_attn_gelu, poly gelu,
            fused SR-attention) — grounding vs tools/profile_pvt_grad.py
  ffn       LN2 + MixFFN + residual only (attention removed)
  mm        LN2 + fc1 + fc2 + residual (dwconv/gelu removed too)
  mm_peak   bare alternating fc1/fc2 matmuls, no scan, no LN — the
            achievable-rate ceiling for these shapes on this chip

Every variant reports ms/call and the bf16 MFU of its matmul FLOPs so the
XLA-glue share (ffn - mm) and the matmul-lowering gap (mm vs mm_peak) are
separately visible. PROFILE_ONLY=substr,substr filters variants.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.models.pvt_v2 import PVTBlock, MixFFN, _LN

B = int(os.environ.get("MICRO_BS", "8"))
H = W = 22
C = 320
HID = 1280
DEPTH = int(os.environ.get("MICRO_DEPTH", "40"))
HEADS = 5
SR = 2
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))

_policy = jax.checkpoint_policies.save_only_these_names(
    "sr_attn_out", "ffn_gelu_out")


class FFNOnlyBlock(nn.Module):
    """norm2 + MixFFN + residual — PVTBlock with the attention half cut."""

    dwconv: str = "conv"

    @nn.compact
    def __call__(self, x, rate, deterministic: bool = True):
        n2 = nn.LayerNorm(**_LN, dtype=jnp.bfloat16, name="norm2")(x)
        y = MixFFN(C, HID, use_fused="never", dwconv_impl=self.dwconv,
                   gelu_impl="poly_native", dtype=jnp.bfloat16,
                   name="mlp")(n2, deterministic)
        return x + y, ()


class MMOnlyBlock(nn.Module):
    """norm2 + fc1 + fc2 + residual — the FFN minus dwconv/gelu."""

    @nn.compact
    def __call__(self, x, rate, deterministic: bool = True):
        n2 = nn.LayerNorm(**_LN, dtype=jnp.bfloat16, name="norm2")(x)
        y = nn.Dense(HID, dtype=jnp.bfloat16, name="fc1")(n2)
        y = nn.Dense(C, dtype=jnp.bfloat16, name="fc2")(y)
        return x + y, ()


def scan_module(block_cls, **block_kw):
    wrapped = nn.remat(block_cls, static_argnums=(3,), prevent_cse=False,
                       policy=_policy)
    return nn.scan(
        wrapped,
        variable_axes={"params": 0},
        split_rngs={"params": True, "droppath": True},
        in_axes=(0, nn.broadcast),
        length=DEPTH,
    )(**block_kw)


def timed_grad(name, module, x, mm_flops_fwd, n=8):
    rates = jnp.zeros((DEPTH,), jnp.float32)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), x, rates, True)
    )()

    def loss_fn(params, x):
        out, _ = module.apply(params, x, rates, True)
        return jnp.mean(out.astype(jnp.float32))

    @jax.jit
    def step(params, x):
        g = jax.grad(loss_fn)(params, x)
        # chain params on the grads so successive calls are data-dependent
        return jax.tree.map(lambda p, gg: p - 1e-30 * gg.astype(p.dtype),
                            params, g)

    def run(k, params):
        for _ in range(k):
            params = step(params, x)
        jax.tree.flatten(params)[0][0].block_until_ready()
        return float(jnp.sum(jax.tree.flatten(params)[0][0])), params

    _, params = run(2, params)
    t0 = time.perf_counter()
    _, params = run(2, params)
    t1 = time.perf_counter()
    _, params = run(2 + n, params)
    t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / n * 1e3
    # grad-call matmul FLOPs ~= 4x fwd for these remat-scanned variants:
    # primal fwd + in-backward recompute (the save_attn_gelu policy trims
    # a little of this, so 4x slightly overstates) + dX + dW. mm_peak has
    # no remat and truly is 3x — so its MFU is comparable, not inflated.
    mfu = mm_flops_fwd * 4 / (ms * 1e-3) / (PEAK_TFLOPS * 1e12) * 100
    print(f"{name:28s} {ms:8.2f} ms   mm-MFU ~{mfu:4.1f}%")
    return ms


def mm_peak(n=8):
    """Bare alternating fc matmuls (no scan/LN), DEPTH pairs chained."""
    w1 = jnp.asarray(np.random.default_rng(0).standard_normal((C, HID)),
                     jnp.bfloat16) * 0.02
    w2 = jnp.asarray(np.random.default_rng(1).standard_normal((HID, C)),
                     jnp.bfloat16) * 0.02
    x = jnp.asarray(np.random.default_rng(2).standard_normal((B * H * W, C)),
                    jnp.bfloat16)

    def loss_fn(ws, x):
        w1, w2 = ws
        for _ in range(DEPTH):
            x = x + (x @ w1) @ w2
        return jnp.mean(x.astype(jnp.float32))

    @jax.jit
    def step(ws, x):
        g = jax.grad(loss_fn)(ws, x)
        return tuple(w - 1e-30 * gg.astype(w.dtype) for w, gg in zip(ws, g))

    ws = (w1, w2)

    def run(k, ws):
        for _ in range(k):
            ws = step(ws, x)
        ws[0].block_until_ready()
        return float(jnp.sum(ws[0])), ws

    _, ws = run(2, ws)
    t0 = time.perf_counter()
    _, ws = run(2, ws)
    t1 = time.perf_counter()
    _, ws = run(2 + n, ws)
    t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / n * 1e3
    fwd = 2 * B * H * W * C * HID * 2 * DEPTH  # fc1+fc2
    mfu = fwd * 3 / (ms * 1e-3) / (PEAK_TFLOPS * 1e12) * 100
    print(f"{'mm_peak (bare matmuls)':28s} {ms:8.2f} ms   mm-MFU ~{mfu:4.1f}%")


def main():
    only = os.environ.get("PROFILE_ONLY", "")
    filters = [s for s in only.split(",") if s]

    def want(name):
        return not filters or any(f in name for f in filters)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    ffn_fwd = 2 * B * H * W * C * HID * 2 * DEPTH
    attn_fwd = 0  # not counted in the mm-MFU figure for `block`

    print(f"# stage3 micro: B={B} {H}x{W}x{C} hid={HID} depth={DEPTH}")
    if want("block"):
        blk = scan_module(
            PVTBlock, dim=C, num_heads=HEADS, mlp_ratio=HID // C, sr_ratio=SR,
            fused_ffn="never", fused_attn="auto", ffn_dwconv="conv",
            ffn_gelu="poly_native", dtype=jnp.bfloat16)
        timed_grad("block (attn+ffn)", blk, x, ffn_fwd + attn_fwd)
    if want("ffn"):
        timed_grad("ffn (ln+fc1+dw+gelu+fc2)", scan_module(FFNOnlyBlock), x,
                   ffn_fwd)
    if want("bwdfused"):  # hybrid: XLA fwd, fused Pallas dwconv+gelu VJP
        timed_grad("ffn bwd_fused",
                   scan_module(FFNOnlyBlock, dwconv="bwd_fused"), x, ffn_fwd)
    if want("mm"):
        timed_grad("mm (ln+fc1+fc2)", scan_module(MMOnlyBlock), x, ffn_fwd)
    if want("mm_peak"):  # "mm", "peak" and "mm_peak" all select this
        mm_peak()


if __name__ == "__main__":
    main()
