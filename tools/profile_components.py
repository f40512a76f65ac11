#!/usr/bin/env python
"""Component-level timing of the EMIP-short forward on the current device.

Uses the same dependency-chained differential timing as bench.py. Run on
the real chip to see where the step time goes (PVT backbone, GMFlow
encoder, flow transformer+matching, correlation embedding, injectors,
decoder).
"""

import os
import sys
import time

# repo-root import without PYTHONPATH (setting PYTHONPATH at all breaks the
# axon TPU plugin registration — see CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig

BS = 8
SIZE = 352


def chain_time(fn, args, n_short=5, n_long=25):
    """fn(variables, x) -> y with y feeding back into x's perturbation."""
    def run(n):
        x = args
        s = None
        for _ in range(n):
            x, s = fn(x)
        return float(s)

    run(2)
    t0 = time.perf_counter()
    run(n_short)
    t1 = time.perf_counter()
    run(n_long)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n_long - n_short)


def main():
    config = EMIPShortConfig()
    model = EMIPShort(config=config, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img0, img0, train=False)
    )()

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)
    h8 = SIZE // 8
    feat = jnp.asarray(rng.standard_normal((BS, h8, h8, 128)), jnp.bfloat16)
    corr = jnp.asarray(
        rng.standard_normal((BS, h8, h8, h8 * h8)), jnp.bfloat16
    )

    timings = {}

    @jax.jit
    def pvt(v, x):
        outs = model.apply(v, x, train=False,
                           method=lambda m, im, train: m.seg_features(im, train))
        s = jnp.mean(outs[0])
        return x + jnp.tanh(s) * 1e-6, s

    timings["pvt_backbone (1 frame)"] = chain_time(
        lambda x: pvt(variables, x), img
    )

    @jax.jit
    def gm_enc(v, x):
        out = model.apply(v, x, method=lambda m, im: m.flow_features(im))[0]
        s = jnp.mean(out)
        return x + jnp.tanh(s) * 1e-6, s

    timings["gmflow_encoder (1 frame)"] = chain_time(
        lambda x: gm_enc(variables, x), img
    )

    @jax.jit
    def flow_engine(v, f):
        fw, bw, cr = model.apply(
            v, [f], [f + 0.01],
            method=lambda m, a, b: m.gmflow(a, b, training=False),
        )
        s = jnp.mean(fw[0]).astype(jnp.bfloat16)
        return f + jnp.tanh(s) * 1e-6, s

    timings["flow transformer+matching+upsample"] = chain_time(
        lambda x: flow_engine(variables, x), feat
    )

    @jax.jit
    def corr_embed(v, c):
        out = model.apply(
            v, c, False, method=lambda m, x, t: m.conv_corr(x, t)
        )
        s = jnp.mean(out)
        return c + jnp.tanh(s).astype(c.dtype) * 1e-6, s

    timings["conv_corr (1936->968->128)"] = chain_time(
        lambda x: corr_embed(variables, x), corr
    )

    @jax.jit
    def full(v, x):
        mask, _, _ = model.apply(v, x, x + 0.01, train=False)
        s = jnp.mean(mask).astype(jnp.float32)
        return x + jnp.tanh(s) * 1e-6, s

    timings["FULL forward"] = chain_time(lambda x: full(variables, x), img)

    total = timings["FULL forward"]
    print(f"batch={BS} @ {SIZE}^2, times per step:")
    for name, t in timings.items():
        print(f"  {name:42s} {t * 1e3:8.2f} ms  ({t / total * 100:5.1f}% of full)")
    # note: pvt and gmflow encoders run twice (two frames) inside FULL
    accounted = (
        2 * timings["pvt_backbone (1 frame)"]
        + 2 * timings["gmflow_encoder (1 frame)"]
        + timings["flow transformer+matching+upsample"]
        + timings["conv_corr (1936->968->128)"]
    )
    print(f"  accounted (2*pvt + 2*enc + flow + corr): "
          f"{accounted * 1e3:.2f} ms of {total * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
