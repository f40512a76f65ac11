#!/usr/bin/env python
"""TRUE in-context component costs via end-to-end ablation.

Micro-benchmarks of single components are distorted by dispatch effects on
the remote TPU tunnel; the trustworthy signal is end-to-end step time.
This tool times the full EMIP-short forward and variants where a stage's
OUTPUT is passed in precomputed (so the stage drops out of the program):
full - variant = the stage's real cost inside the compiled step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig

BS = int(os.environ.get("BS", "8"))
SIZE = int(os.environ.get("SIZE", "352"))


from tools._timing import timed as _timed


def timed(fn, args, n=10):
    return _timed(fn, args, n)


def main():
    config = EMIPShortConfig()
    model = EMIPShort(config=config, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img0, img0, train=False)
    )()

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)), jnp.float32)

    def scalar(*outs):
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    # ---- precompute every intermediate once (host side) ----
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

    # ---- variants ----
    @jax.jit
    def full(v, i1, i2):
        def fn(m, i1, i2):
            mask, ffw, fbw = m(i1, i2, train=False)
            return scalar(mask, ffw[0], fbw[0])

        return model.apply(v, i1, i2, method=fn)

    @jax.jit
    def no_pvt(v, i1, i2, fea_1, fea_2):
        def fn(m, i1, i2, fea_1, fea_2):
            f1gm = m.flow_features(i1)[0]
            f2gm = m.flow_features(i2)[0]
            a = m.injector(f1gm, fea_1[0])
            b = m.injector(f2gm, fea_2[0])
            ffw, fbw, corr = m.gmflow([a], [b], training=False)
            ce = m.conv_corr(corr, False)
            mask, _ = m.decode(fea_1[0], fea_1[1], fea_1[2], ce, False)
            return scalar(mask, ffw[0], fbw[0])

        return model.apply(v, i1, i2, fea_1, fea_2, method=fn)

    @jax.jit
    def no_enc(v, i1, i2, fgm1, fgm2):
        def fn(m, i1, i2, fgm1, fgm2):
            fea_1 = m.seg_features(i1, False)
            fea_2 = m.seg_features(i2, False)
            a = m.injector(fgm1, fea_1[0])
            b = m.injector(fgm2, fea_2[0])
            ffw, fbw, corr = m.gmflow([a], [b], training=False)
            ce = m.conv_corr(corr, False)
            mask, _ = m.decode(fea_1[0], fea_1[1], fea_1[2], ce, False)
            return scalar(mask, ffw[0], fbw[0])

        return model.apply(v, i1, i2, fgm1, fgm2, method=fn)

    @jax.jit
    def no_flow_engine(v, i1, i2, flow_fw, flow_bw, corr):
        def fn(m, i1, i2, ffw, fbw, corr):
            fea_1 = m.seg_features(i1, False)
            fea_2 = m.seg_features(i2, False)
            f1gm = m.flow_features(i1)[0]
            f2gm = m.flow_features(i2)[0]
            a = m.injector(f1gm, fea_1[0])
            b = m.injector(f2gm, fea_2[0])
            ce = m.conv_corr(corr, False)
            mask, _ = m.decode(fea_1[0], fea_1[1], fea_1[2], ce, False)
            return scalar(mask, ffw, fbw, a, b)

        return model.apply(v, i1, i2, flow_fw, flow_bw, corr, method=fn)

    @jax.jit
    def no_conv_corr(v, i1, i2, corr_emb):
        def fn(m, i1, i2, ce):
            fea_1 = m.seg_features(i1, False)
            fea_2 = m.seg_features(i2, False)
            f1gm = m.flow_features(i1)[0]
            f2gm = m.flow_features(i2)[0]
            a = m.injector(f1gm, fea_1[0])
            b = m.injector(f2gm, fea_2[0])
            ffw, fbw, corr = m.gmflow([a], [b], training=False)
            mask, _ = m.decode(fea_1[0], fea_1[1], fea_1[2], ce, False)
            return scalar(mask, ffw[0], fbw[0])

        return model.apply(v, i1, i2, corr_emb, method=fn)

    @jax.jit
    def no_decode(v, i1, i2):
        def fn(m, i1, i2):
            fea_1 = m.seg_features(i1, False)
            fea_2 = m.seg_features(i2, False)
            f1gm = m.flow_features(i1)[0]
            f2gm = m.flow_features(i2)[0]
            a = m.injector(f1gm, fea_1[0])
            b = m.injector(f2gm, fea_2[0])
            ffw, fbw, corr = m.gmflow([a], [b], training=False)
            ce = m.conv_corr(corr, False)
            return scalar(ce, ffw[0], fbw[0], fea_1[1], fea_1[2])

        return model.apply(v, i1, i2, method=fn)

    t_full = timed(full, (variables, img1, img2))
    print(f"full forward                {t_full*1e3:7.2f} ms")
    for name, fn, args in (
        ("no 2xPVT", no_pvt, (variables, img1, img2, fea_1, fea_2)),
        ("no 2xCNN-encoder", no_enc, (variables, img1, img2, fgm1, fgm2)),
        ("no flow engine", no_flow_engine,
         (variables, img1, img2, flow_fw, flow_bw, corr)),
        ("no conv_corr", no_conv_corr, (variables, img1, img2, corr_emb)),
        ("no decode (inj1+DR+NCD)", no_decode, (variables, img1, img2)),
    ):
        t = timed(fn, args)
        print(f"{name:26s}  {t*1e3:7.2f} ms  (component ~ "
              f"{(t_full-t)*1e3:6.2f} ms)")


if __name__ == "__main__":
    main()
