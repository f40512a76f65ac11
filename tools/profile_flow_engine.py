#!/usr/bin/env python
"""Sub-profile of the flow engine at 44x44x128 (bs=8 pairs -> 2B=16)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.models.gmflow import GMFlow, GMFlowConfig

BS = 8
H = W = 44
C = 128


def chain_time(fn, x, n_short=5, n_long=25):
    def run(n):
        a = x
        s = None
        for _ in range(n):
            a, s = fn(a)
        return float(s)

    run(2)
    t0 = time.perf_counter()
    run(n_short)
    t1 = time.perf_counter()
    run(n_long)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n_long - n_short)


def main():
    cfg = GMFlowConfig()
    model = GMFlow(config=cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((BS, H, W, C)), jnp.bfloat16)
    feat2b = jnp.asarray(rng.standard_normal((2 * BS, H, W, C)), jnp.bfloat16)
    flow2b = jnp.asarray(rng.standard_normal((2 * BS, H, W, 2)), jnp.float32)

    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    f0 = jnp.zeros((1, H, W, C), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), img, [f0], [f0],
        method=lambda m, im, a, b: (m.encode(im), m(a, b)),
    )

    timings = {}

    @jax.jit
    def transformer_only(v, f):
        a, b = model.apply(
            v, f, f + 0.01, 2,
            method=lambda m, x, y, s: m.transformer(x, y, attn_num_splits=s),
        )
        s = jnp.mean(a)
        return f + jnp.tanh(s) * 1e-6, s

    timings["feature transformer (6 blocks)"] = chain_time(
        lambda x: transformer_only(variables, x), feat
    )

    @jax.jit
    def matching_only(f):
        from emip_tpu.models.gmflow.matching import global_correlation_softmax

        flow, _, corr = global_correlation_softmax(f, f + 0.01, True)
        s = jnp.mean(flow).astype(jnp.bfloat16) + jnp.mean(corr).astype(
            jnp.bfloat16
        )
        return f + jnp.tanh(s) * 1e-6, s

    timings["global correlation softmax (pallas)"] = chain_time(
        matching_only, feat
    )

    @jax.jit
    def ffa_only(v, f):
        out = model.apply(
            v, f, flow2b,
            method=lambda m, x, fl: m.feature_flow_attn(x, fl),
        )
        s = jnp.mean(out).astype(jnp.bfloat16)
        return f + jnp.tanh(s) * 1e-6, s

    timings["flow propagation attention (pallas)"] = chain_time(
        lambda x: ffa_only(variables, x), feat2b
    )

    @jax.jit
    def position_only(f):
        from emip_tpu.models.gmflow.gmflow import _add_position

        a, b = _add_position(f, f + 0.01, 2, C)
        s = jnp.mean(a).astype(jnp.bfloat16)
        return f + jnp.tanh(s) * 1e-6, s

    timings["sine position add"] = chain_time(position_only, feat2b)

    @jax.jit
    def upsample_only(v, f):
        from emip_tpu.ops.upsample import convex_upsample

        mask = model.apply(
            v, flow2b, f,
            method=lambda m, fl, x: m._upsample_mask(fl, x),
        )
        up = convex_upsample(flow2b, mask, factor=8)
        s = jnp.mean(up).astype(jnp.bfloat16)
        return f + jnp.tanh(s) * 1e-6, s

    timings["upsampler convs + convex upsample"] = chain_time(
        lambda x: upsample_only(variables, x), feat2b
    )

    @jax.jit
    def full_engine(v, f):
        fw, bw, corr = model.apply(v, [f], [f + 0.01], False)
        s = jnp.mean(fw[0]).astype(jnp.bfloat16)
        return f + jnp.tanh(s) * 1e-6, s

    timings["FULL flow engine"] = chain_time(
        lambda x: full_engine(variables, x), feat
    )

    print(f"pairs={BS} (2B={2*BS}) @ {H}x{W}x{C}:")
    for name, t in timings.items():
        print(f"  {name:44s} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
