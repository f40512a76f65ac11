#!/usr/bin/env python
"""Per-stage PVTv2-B5 cost at 352^2 (bs=8) + dwconv/attention attribution."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.models.pvt_v2 import PVT_V2_VARIANTS, PVTv2

BS = 8
SIZE = 352


from tools._timing import timed as _timed


def timed(fn, args, n=8):
    return _timed(fn, args, n)


def main():
    cfg = PVT_V2_VARIANTS["pvt_v2_b5"]
    import dataclasses

    cfg = dataclasses.replace(cfg, remat=False)
    model = PVTv2(config=cfg, dtype=jnp.bfloat16)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), img))()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)

    @jax.jit
    def full(v, x):
        outs = model.apply(v, x, train=False)
        return sum(jnp.mean(o.astype(jnp.float32)) for o in outs)

    t_full = timed(full, (variables, x))
    print(f"PVTv2-B5 full (bs={BS})        {t_full*1e3:7.2f} ms")

    # per-stage: truncated configs (stages 1..k)
    prev = 0.0
    for k in range(1, 5):
        sub = dataclasses.replace(
            cfg,
            embed_dims=cfg.embed_dims[:k],
            num_heads=cfg.num_heads[:k],
            mlp_ratios=cfg.mlp_ratios[:k],
            depths=cfg.depths[:k],
            sr_ratios=cfg.sr_ratios[:k],
        )
        m = PVTv2(config=sub, dtype=jnp.bfloat16)
        v = jax.jit(lambda m=m: m.init(jax.random.PRNGKey(0), img))()

        @jax.jit
        def upto(v, x, m=m):
            outs = m.apply(v, x, train=False)
            return sum(jnp.mean(o.astype(jnp.float32)) for o in outs)

        t = timed(upto, (v, x))
        print(f"  stages 1..{k}: {t*1e3:7.2f} ms  (stage {k} ~ "
              f"{(t-prev)*1e3:6.2f} ms)")
        prev = t


if __name__ == "__main__":
    main()
