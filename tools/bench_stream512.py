#!/usr/bin/env python
"""Streaming long-model inference at 512^2 with HBM-resident state.

BASELINE.json config #5 (stretch): batched multi-clip streaming through the
long-term model at 512^2 — per-frame jitted steps carrying the fixed-shape
LTM ring buffer in HBM. Reports frames/sec (chained differential timing).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.models.emip_long import EMIPLong
from emip_tpu.models.emip_short import EMIPShortConfig

SIZE = int(os.environ.get("STREAM_SIZE", "512"))
CLIPS = int(os.environ.get("STREAM_CLIPS", "1"))  # batched multi-clip


def main():
    cfg = EMIPShortConfig(inp_size=SIZE)
    model = EMIPLong(config=cfg, memory_size=5, dtype=jnp.bfloat16)

    img = jnp.zeros((CLIPS, SIZE, SIZE, 3), jnp.float32)
    mem = model.init_memory(CLIPS)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img, img, mem, False)
    )()

    @jax.jit
    def step(variables, prev, cur, mem):
        mask, _, new_mem = model.apply(variables, prev, cur, mem, False)
        eps = jnp.tanh(jnp.mean(mask)) * 1e-6
        return cur + eps, new_mem, jnp.mean(mask)

    rng = np.random.default_rng(0)
    f0 = jnp.asarray(rng.standard_normal((CLIPS, SIZE, SIZE, 3)), jnp.float32)
    f1 = jnp.asarray(rng.standard_normal((CLIPS, SIZE, SIZE, 3)), jnp.float32)

    def run(n):
        prev, cur, m = f0, f1, mem
        s = None
        for _ in range(n):
            nxt, m, s = step(variables, prev, cur, m)
            prev, cur = cur, nxt
        return float(s)

    run(2)
    t0 = time.perf_counter()
    run(3)
    t1 = time.perf_counter()
    run(13)
    t2 = time.perf_counter()
    step_s = ((t2 - t1) - (t1 - t0)) / 10
    print(f"streaming {CLIPS} clip(s) @ {SIZE}^2: {step_s * 1e3:.1f} ms/frame"
          f" -> {CLIPS / step_s:.2f} frames/s")


if __name__ == "__main__":
    main()
