#!/usr/bin/env python
"""A/B: flagship inference with the fused Pallas window-attention layers."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
from emip_tpu.models.gmflow import GMFlowConfig

BS = 8
SIZE = 352


def main():
    config = EMIPShortConfig(gmflow=GMFlowConfig(use_fused_attn=True))
    model = EMIPShort(config=config, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img0, img0, train=False)
    )()

    @jax.jit
    def chained(variables, image1, image2):
        mask, _, _ = model.apply(variables, image1, image2, train=False)
        eps = jnp.tanh(jnp.mean(mask)) * 1e-6
        return image1 + eps, image2 + eps, jnp.mean(mask)

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)

    def run(n):
        a, b = img1, img2
        s = None
        for _ in range(n):
            a, b, s = chained(variables, a, b)
        return float(s)

    t0 = time.perf_counter()
    run(2)
    print(f"# compile+warmup: {time.perf_counter() - t0:.0f}s")
    t0 = time.perf_counter()
    run(5)
    t1 = time.perf_counter()
    run(25)
    t2 = time.perf_counter()
    step_s = ((t2 - t1) - (t1 - t0)) / 20
    print(f"fused-attn bs={BS}: {step_s * 1e3:.2f} ms/step -> "
          f"{BS / step_s:.2f} frames/s")


if __name__ == "__main__":
    main()
