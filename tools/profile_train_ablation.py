#!/usr/bin/env python
"""TRUE in-context train-step costs via end-to-end gradient ablation.

Times the full loss+grad step and variants where a stage's output is a
precomputed constant (killing both its forward AND backward+recompute):
full - variant = that stage's total share of the training step.
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
    img0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img0, img0, train=False)
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

    # precompute stage outputs once
    def intermediates(v, i1, i2):
        def fn(m, i1, i2):
            out = m.forward_full(i1, i2, train=False)
            return (out["fea_1"], out["fea_2"], out["flow_fw"][0],
                    out["flow_bw"][0], out["corr"], out["corr_emb"])

        return model.apply(v, i1, i2, method=fn)

    fea_1, fea_2, flow_fw, flow_bw, corr, corr_emb = jax.jit(intermediates)(
        variables, img1, img2
    )
    fgm1, fgm2 = jax.jit(
        lambda v, i1, i2: (
            model.apply(v, i1, method=lambda m, x: m.flow_features(x))[0],
            model.apply(v, i2, method=lambda m, x: m.flow_features(x))[0],
        )
    )(variables, img1, img2)

    def losses(mask, ffw_list, fbw_list):
        lp = hybrid_e_loss(mask, gts)
        lf, _, _ = unsup_flow_loss(
            list(zip(ffw_list, fbw_list)), img1, img2, cfg)
        return lp + lf

    def run_grad(body, extra):
        def step(trainable, frozen, bstats, *extra_args):
            def loss_fn(tr):
                params = merge_params(tr, frozen)
                var = {"params": params, "batch_stats": bstats}
                return body(var, *extra_args)

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            return loss, jax.tree_util.tree_leaves(grads)[0]

        fn = jax.jit(step)
        return timed(fn, (state.params, state.frozen, state.batch_stats)
                     + tuple(extra))

    def full_body(var):
        def fn(m, i1, i2):
            mask, ffw, fbw = m(i1, i2, train=True)
            return losses(mask, ffw, fbw)

        return model.apply(var, img1, img2, method=fn,
                           mutable=["batch_stats"],
                           rngs={"droppath": key, "dropout": key})[0]

    def no_pvt_body(var, fea_1, fea_2):
        def fn(m, i1, i2, fea_1, fea_2):
            f1gm = m.flow_features(i1)[0]
            f2gm = m.flow_features(i2)[0]
            a = m.injector(f1gm, fea_1[0])
            b = m.injector(f2gm, fea_2[0])
            ffw, fbw, corr = m.gmflow([a], [b], training=True)
            ce = m.conv_corr(corr, True)
            mask, _ = m.decode(fea_1[0], fea_1[1], fea_1[2], ce, True)
            return losses(mask, ffw, fbw)

        return model.apply(var, img1, img2, fea_1, fea_2, method=fn,
                           mutable=["batch_stats"],
                           rngs={"droppath": key, "dropout": key})[0]

    def no_enc_body(var, fgm1, fgm2):
        def fn(m, i1, i2, fgm1, fgm2):
            fea_1 = m.seg_features(i1, True)
            fea_2 = m.seg_features(i2, True)
            a = m.injector(fgm1, fea_1[0])
            b = m.injector(fgm2, fea_2[0])
            ffw, fbw, corr = m.gmflow([a], [b], training=True)
            ce = m.conv_corr(corr, True)
            mask, _ = m.decode(fea_1[0], fea_1[1], fea_1[2], ce, True)
            return losses(mask, ffw, fbw)

        return model.apply(var, img1, img2, fgm1, fgm2, method=fn,
                           mutable=["batch_stats"],
                           rngs={"droppath": key, "dropout": key})[0]

    def no_flow_engine_body(var, ffw, fbw, corr):
        def fn(m, i1, i2, ffw, fbw, corr):
            fea_1 = m.seg_features(i1, True)
            fea_2 = m.seg_features(i2, True)
            f1gm = m.flow_features(i1)[0]
            f2gm = m.flow_features(i2)[0]
            a = m.injector(f1gm, fea_1[0])
            b = m.injector(f2gm, fea_2[0])
            ce = m.conv_corr(corr, True)
            mask, _ = m.decode(fea_1[0], fea_1[1], fea_1[2], ce, True)
            # keep a/b live so the injector still trains
            return losses(mask, [ffw], [fbw]) + 0.0 * (
                jnp.mean(a.astype(jnp.float32))
                + jnp.mean(b.astype(jnp.float32)))

        return model.apply(var, img1, img2, ffw, fbw, corr, method=fn,
                           mutable=["batch_stats"],
                           rngs={"droppath": key, "dropout": key})[0]

    def no_flow_loss_body(var):
        def fn(m, i1, i2):
            mask, ffw, fbw = m(i1, i2, train=True)
            return hybrid_e_loss(mask, gts) + 0.0 * jnp.mean(
                ffw[0].astype(jnp.float32))

        return model.apply(var, img1, img2, method=fn,
                           mutable=["batch_stats"],
                           rngs={"droppath": key, "dropout": key})[0]

    t_full = run_grad(full_body, ())
    print(f"full grad step              {t_full*1e3:7.2f} ms")
    for name, body, extra in (
        ("no 2xPVT (fwd+bwd)", no_pvt_body, (fea_1, fea_2)),
        ("no 2xCNN-encoder", no_enc_body, (fgm1, fgm2)),
        ("no flow engine", no_flow_engine_body, (flow_fw, flow_bw, corr)),
        ("no flow loss", no_flow_loss_body, ()),
    ):
        t = run_grad(body, extra)
        print(f"{name:26s}  {t*1e3:7.2f} ms  (share ~ "
              f"{(t_full-t)*1e3:6.2f} ms)")


if __name__ == "__main__":
    main()
