#!/usr/bin/env python
"""Attribute training-step time: which loss/backward path costs what.

Times jitted variants of the train step's pieces (chained-dependency
differential timing, see bench.py):
  fwd            — model forward only (no loss)
  loss_both      — forward + both losses, no grad
  grad_pred      — grad of hybrid_e_loss only
  grad_flow      — grad of unsup_flow_loss only
  grad_both      — grad of the full loss (the real step minus optimizer)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.losses.flow import UnsupFlowLossConfig, unsup_flow_loss
from emip_tpu.losses.seg import hybrid_e_loss
from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
from emip_tpu.train.state import GMFLOW_FREEZE, TrainState, build_optimizer
from emip_tpu.train.state import merge_params

BS = int(os.environ.get("BS", "8"))
SIZE = 352


from tools._timing import timed as _timed


def timed(fn, args, n=6):
    return _timed(fn, args, n)


def main():
    model = EMIPShort(config=EMIPShortConfig(), dtype=jnp.bfloat16)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img, img, train=False)
    )()
    tx = build_optimizer()
    state = TrainState.create(variables, tx, GMFLOW_FREEZE)

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)
    gts = jnp.asarray(rng.uniform(size=(BS, SIZE, SIZE, 1)) > 0.5,
                      jnp.float32)
    cfg = UnsupFlowLossConfig()
    key = jax.random.PRNGKey(1)

    def forward(trainable, frozen, bstats, img1, img2):
        params = merge_params(trainable, frozen)
        (mask, ffw, fbw), _ = model.apply(
            {"params": params, "batch_stats": bstats}, img1, img2,
            train=True, rngs={"droppath": key, "dropout": key},
            mutable=["batch_stats"],
        )
        return mask, ffw, fbw

    def loss_of(trainable, frozen, bstats, img1, img2, gts, which):
        mask, ffw, fbw = forward(trainable, frozen, bstats, img1, img2)
        lp = hybrid_e_loss(mask, gts)
        lf, _, _ = unsup_flow_loss(list(zip(ffw, fbw)), img1, img2, cfg)
        if which == "pred":
            return lp
        if which == "flow":
            return lf
        return lp + lf

    args = (state.params, state.frozen, state.batch_stats, img1, img2)

    fwd = jax.jit(forward)
    t = timed(fwd, args)
    print(f"fwd               {t*1e3:8.1f} ms")

    for which in ("pred", "flow", "both"):
        f = jax.jit(lambda *a, _w=which: loss_of(*a, gts, _w))
        t = timed(f, args)
        print(f"loss_{which:<12} {t*1e3:8.1f} ms (no grad)")

    for which in ("pred", "flow", "both"):
        g = jax.jit(jax.grad(lambda p, *a, _w=which: loss_of(p, *a, gts, _w)))
        t = timed(g, args)
        print(f"grad_{which:<12} {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
