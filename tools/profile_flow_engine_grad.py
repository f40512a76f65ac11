#!/usr/bin/env python
"""Isolate the flow-engine and flow-loss backward costs (bs=8, 352^2).

Variants (all jitted, value_and_grad over the trainable params or flows):
  engine fwd          — gmflow([a],[b]) forward only (injected features
                        precomputed)
  engine fwd+bwd      — grad of sum(flows)+sum(corr) through the engine
  loss fwd            — unsup_flow_loss on precomputed flows
  loss fwd+bwd(flows) — grad of the loss w.r.t. the flows themselves
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.losses.flow import UnsupFlowLossConfig, unsup_flow_loss
from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
from emip_tpu.train.state import GMFLOW_FREEZE, TrainState, build_optimizer
from emip_tpu.train.state import merge_params
from tools._timing import timed

BS = int(os.environ.get("BS", "8"))
SIZE = 352


def main():
    model = EMIPShort(config=EMIPShortConfig(), dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img0, img0, train=False)
    )()
    tx = build_optimizer()
    state = TrainState.create(variables, tx, GMFLOW_FREEZE)

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)

    # precompute injected features and flows once
    def feats(v, i1, i2):
        def fn(m, i1, i2):
            out = m.forward_full(i1, i2, train=False)
            return (out["fea_1"][0], out["fea_2"][0], out["flow_fw"][0],
                    out["flow_bw"][0])

        return model.apply(v, i1, i2, method=fn)

    fea1, fea2, flow_fw, flow_bw = jax.jit(feats)(variables, img1, img2)

    def run_gm(v, fea1, fea2):
        def fn(m, fea1, fea2):
            f1gm = m.flow_features(img1)[0]
            f2gm = m.flow_features(img2)[0]
            a = m.injector(f1gm, fea1)
            b = m.injector(f2gm, fea2)
            ffw, fbw, corr = m.gmflow([a], [b], training=True)
            return (jnp.sum(ffw[0].astype(jnp.float32))
                    + jnp.sum(fbw[0].astype(jnp.float32))
                    + jnp.sum(corr.astype(jnp.float32)))

        return model.apply(v, fea1, fea2, method=fn)

    @jax.jit
    def engine_fwd(tr, frozen, bstats, fea1, fea2):
        v = {"params": merge_params(tr, frozen), "batch_stats": bstats}
        return run_gm(v, fea1, fea2)

    @jax.jit
    def engine_grad(tr, frozen, bstats, fea1, fea2):
        loss, g = jax.value_and_grad(
            lambda tr: run_gm(
                {"params": merge_params(tr, frozen), "batch_stats": bstats},
                fea1, fea2)
        )(tr)
        return loss, jax.tree_util.tree_leaves(g)[0]

    cfg = UnsupFlowLossConfig()

    @jax.jit
    def loss_fwd(ffw, fbw):
        total, _, _ = unsup_flow_loss([(ffw, fbw)], img1, img2, cfg)
        return total

    @jax.jit
    def loss_grad(ffw, fbw):
        def f(ffw, fbw):
            total, _, _ = unsup_flow_loss([(ffw, fbw)], img1, img2, cfg)
            return total

        l, g = jax.value_and_grad(f, argnums=(0, 1))(ffw, fbw)
        return l, g[0]

    args = (state.params, state.frozen, state.batch_stats, fea1, fea2)
    print(f"engine fwd            {timed(engine_fwd, args)*1e3:7.2f} ms")
    print(f"engine fwd+bwd        {timed(engine_grad, args)*1e3:7.2f} ms")
    print(f"loss fwd              {timed(loss_fwd, (flow_fw, flow_bw))*1e3:7.2f} ms")
    print(f"loss fwd+bwd(flows)   {timed(loss_grad, (flow_fw, flow_bw))*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
