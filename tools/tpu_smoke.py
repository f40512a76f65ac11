"""TPU Mosaic-lowering smoke for every Pallas kernel entry point.

Round-3 shipped a kernel whose bias BlockSpec was legal in interpreter
mode (all CPU pytest runs) but rejected by the real Mosaic lowering at
batch > 1 — the driver's bench capture was the first time the kernel met
the TPU, and the long-model + 512^2 streaming sections crashed
(BENCH_r03.json). This script closes that gap: it *compiles* (lower +
compile, no execution, no real data) the forward AND gradient of every
Pallas kernel entry point at every production shape, on the real chip.
With the persistent XLA compile cache, a repeat run costs seconds.

Run before any kernel commit or bench capture:

    timeout 1800 python tools/tpu_smoke.py            # all kernels
    timeout 1800 python tools/tpu_smoke.py -k memory  # substring filter

Exit code 0 = every case compiled; 1 = at least one lowering/compile
failure (each printed with its case name); 2 = no TPU backend available
(the smoke is meaningless in interpreter mode — that is the very gap it
exists to close).

Shapes covered (production configs, see bench.py / BASELINE.json):
  352^2 short model  : bs 1/8/16 -> flow batch B = 2*bs, T=484, HW=1936
  352^2 long trainer : bs 4, 5-slot memory -> N = 5*1936 = 9680
  512^2 streaming    : bs 1/4, T=1024, HW=4096, memory N = 20480
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import emip_tpu  # noqa: F401  (enables the persistent compile cache)
import jax
import jax.numpy as jnp

F32 = jnp.float32
BF16 = jnp.bfloat16


def sds(shape, dtype=F32):
    return jax.ShapeDtypeStruct(tuple(shape), dtype)


def _cases(include_optin=False):
    """Yield (name, fn, abstract_args, grad_argnums | None).

    ``include_optin`` adds kernels that are default-OFF in production
    (fused_dwconv_gelu: measured slower end-to-end, kept for tests; its
    whole-image VMEM layout does not fit production shapes on TPU).
    """
    from emip_tpu.ops.pallas.convex_upsample import convex_upsample_pallas
    from emip_tpu.ops.pallas.corr_softmax import (
        fused_flow_attention,
        softmax_expectation,
    )
    from emip_tpu.ops.pallas.memory_attention import masked_memory_attention
    from emip_tpu.ops.pallas.mixffn import fused_dwconv_gelu
    from emip_tpu.ops.pallas.splat import splat_density_pallas
    from emip_tpu.ops.pallas.sr_attention import fused_sr_attention
    from emip_tpu.ops.pallas.window_attention import (
        fused_window_attention_block,
        fused_window_attention_ffn_layer,
        fused_window_attention_layer,
    )

    # ---- LTM memory read: the round-3 regression site --------------
    # 352^2 long train (HW=1936, N=9680) and 512^2 streaming (HW=4096,
    # N=20480), incl. B>1 which the (1, n) bias BlockSpec rejected.
    for b, hw in ((1, 4096), (4, 4096), (4, 1936), (8, 1936)):
        n = 5 * hw
        yield (
            f"masked_memory_attention[B={b},HW={hw},N={n}]",
            masked_memory_attention,
            (sds((b, hw, 128)), sds((b, n, 128)), sds((b, n, 128)),
             sds((b, n))),
            (0, 1, 2),
        )

    # ---- global-matching softmax expectation ------------------------
    for b, m in ((16, 1936), (32, 1936), (2, 4096), (8, 4096)):
        yield (
            f"softmax_expectation[B={b},M={m}]",
            softmax_expectation,
            (sds((b, m, m)), sds((m, 2))),
            (0, 1),
        )

    # ---- flow-propagation attention ---------------------------------
    for b, l in ((16, 1936), (32, 1936), (2, 4096), (8, 4096)):
        yield (
            f"fused_flow_attention[B={b},L={l}]",
            fused_flow_attention,
            (sds((b, l, 128), BF16), sds((b, l, 128), BF16), sds((b, l, 2))),
            (0, 1, 2),
        )

    # ---- convex upsample ---------------------------------------------
    for b, h in ((16, 44), (32, 44), (2, 64), (8, 64)):
        yield (
            f"convex_upsample[B={b},h={h}]",
            lambda flow, mask: convex_upsample_pallas(flow, mask, 8),
            (sds((b, h, h, 2)), sds((b, h, h, 9 * 64))),
            (0, 1),
        )

    # ---- forward-splat density (occlusion) ---------------------------
    for n, h in ((16, 352), (32, 352), (2, 512), (8, 512)):
        yield (
            f"splat_density[N={n},{h}^2]",
            splat_density_pallas,
            (sds((n, h, h, 2)),),
            (0,),
        )

    # ---- PVT fused SR-attention: all four b5 stages -------------------
    # stage: (C, heads, sr) ; N = (side/8 * 8 / stride)^2
    pvt = [(64, 1, 8), (128, 2, 4), (320, 5, 2), (512, 8, 1)]
    for side in (352, 512):
        strides = (4, 8, 16, 32)
        for (c, heads, sr), stride in zip(pvt, strides):
            npix = (side // stride) ** 2
            m = npix // (sr * sr)
            for b in ((2, 16) if side == 352 else (2, 8)):
                yield (
                    f"fused_sr_attention[{side},B={b},C={c}]",
                    lambda x, kv, wq, bq, wkv, bkv, wp, bp, _h=heads:
                        fused_sr_attention(x, kv, wq, bq, wkv, bkv, wp, bp,
                                           _h),
                    (sds((b, npix, c), BF16), sds((b, m, c), BF16),
                     sds((c, c), BF16), sds((c,)),
                     sds((c, 2 * c), BF16), sds((2 * c,)),
                     sds((c, c), BF16), sds((c,))),
                    (0, 1, 2, 4, 6),
                )

    # ---- MixFFN bwd_fused (XLA fwd + Pallas VJP): the grad path is the
    # kernel, so compile fwd+grad at every 352^2 train stage the size
    # gate admits (hw*hidden <= 2M; grads only exist in 352^2 training —
    # the long trainer freezes the backbone, streaming runs no backward)
    from emip_tpu.ops.pallas.mixffn import dwconv_gelu_bwd_fused

    for (side_hw, f) in ((88, 256), (44, 512), (22, 1280), (11, 2048)):
        yield (
            f"dwconv_gelu_bwd_fused[B=8,{side_hw}^2,F={f}]",
            lambda u, wdw, bdw, _s=side_hw: dwconv_gelu_bwd_fused(
                u, wdw, bdw, _s, _s, "poly_native"),
            (sds((8, side_hw * side_hw, f), BF16), sds((3, 3, f), BF16),
             sds((f,))),
            (0, 1, 2),
        )

    # ---- MixFFN dwconv+gelu: opt-in only (default OFF — measured
    # slower end-to-end AND whole-image VMEM blocks exceed scoped VMEM
    # at production shapes; kept for CPU tests of the kernel math) -----
    if include_optin:
        for b, side, f in ((16, 88, 512), (2, 128, 512)):
            yield (
                f"fused_dwconv_gelu[B={b},{side}^2,F={f}]",
                lambda u, wdw, bdw, _s=side: fused_dwconv_gelu(u, wdw, bdw,
                                                               _s, _s),
                (sds((b, side * side, f), BF16), sds((3, 3, f), BF16),
                 sds((f,))),
                (0, 1),
            )

    # ---- flow-transformer window attention ----------------------------
    # x,t: [B, K2, T, C]; 352^2 -> T=484, 512^2 -> T=1024 (row-tiled fwd)
    c = 128
    for b, t in ((32, 484), (4, 1024), (16, 1024)):
        base = (sds((b, 4, t, c), BF16), sds((b, 4, t, c), BF16),
                sds((c, c), BF16), sds((c, c), BF16), sds((c, c), BF16),
                sds((c, c), BF16), sds((c,)), sds((c,)))
        mask = sds((4, t, t))
        yield (
            f"window_attention_layer[B={b},T={t}]",
            lambda x, xt, wq, wk, wv, wm, s, bb, m:
                fused_window_attention_layer(x, xt, wq, wk, wv, wm, s, bb,
                                             m),
            base + (mask,),
            (0, 1, 2, 3, 4, 5),
        )
        ffn = (sds((2 * c, 4 * 2 * c), BF16), sds((4 * 2 * c, c), BF16),
               sds((c,)), sds((c,)))
        yield (
            f"window_attention_ffn_layer[B={b},T={t}]",
            lambda x, xt, wq, wk, wv, wm, s1, b1, w0, w2, s2, b2, m:
                fused_window_attention_ffn_layer(
                    x, xt, wq, wk, wv, wm, s1, b1, w0, w2, s2, b2, m),
            base + ffn + (mask,),
            (0, 1, 2, 8, 9),
        )
        yield (
            f"window_attention_block[B={b},T={t}]",
            lambda x, xt, swq, swk, swv, swm, ss1, sb1, cwq, cwk, cwv, cwm,
                   cs1, cb1, cw0, cw2, cs2, cb2, m:
                fused_window_attention_block(
                    x, xt,
                    dict(wq=swq, wk=swk, wv=swv, wm=swm, s1=ss1, b1=sb1),
                    dict(wq=cwq, wk=cwk, wv=cwv, wm=cwm, s1=cs1, b1=cb1,
                         w0=cw0, w2=cw2, s2=cs2, b2=cb2),
                    m),
            base + base[2:] + ffn + (mask,),
            (0, 1, 2, 8, 14, 15),
        )


def _graph_cases():
    """Whole-program lowering of the three production device programs.

    Kernels passing in isolation does not prove the *graphs* lower: the
    r3 regression was a kernel, the r4 regression was a harness — the
    next one will be a whole-graph interaction (layout propagation,
    fusion, VMEM scoping across kernel boundaries). Each case lowers +
    compiles one end-to-end program at its production shape with fully
    abstract params/optimizer state (jax.eval_shape — no weights are
    built, no data moves, nothing executes; the compile cache makes
    repeats free).

    Yields (name, build) where build() returns a jax.stages.Lowered.
    """
    import jax.random as jr

    from emip_tpu.models.emip_long import EMIPLong
    from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
    from emip_tpu.train.long import make_long_train_step
    from emip_tpu.train.short import make_short_train_step
    from emip_tpu.train.state import (
        GMFLOW_FREEZE,
        SHORT_TERM_FREEZE,
        TrainState,
        build_optimizer,
    )

    key = jr.PRNGKey(0)

    def short_train():
        model = EMIPShort(config=EMIPShortConfig(), dtype=BF16)
        img = sds((1, 352, 352, 3))
        variables = jax.eval_shape(
            lambda k, a, b: model.init(k, a, b, train=False), key, img, img)
        tx = build_optimizer()
        state = jax.eval_shape(
            lambda v: TrainState.create(v, tx, GMFLOW_FREEZE), variables)
        step = make_short_train_step(model, tx, donate=False)
        bs = 8
        batch = dict(image1=sds((bs, 352, 352, 3)),
                     image2=sds((bs, 352, 352, 3)),
                     gt=sds((bs, 352, 352, 1)))
        return step.lower(state, batch, key)

    def long_train():
        model = EMIPLong(config=EMIPShortConfig(), memory_size=5,
                         dtype=BF16)
        img = sds((1, 352, 352, 3))
        mem1 = jax.eval_shape(lambda: model.init_memory(1))
        variables = jax.eval_shape(
            lambda k, a, b, m: model.init(k, a, b, m, False),
            key, img, img, mem1)
        tx = build_optimizer()
        state = jax.eval_shape(
            lambda v: TrainState.create(v, tx, SHORT_TERM_FREEZE),
            variables)
        step = make_long_train_step(model, tx, donate=False)
        bs = 4
        mem = jax.eval_shape(lambda: model.init_memory(bs))
        frame = sds((bs, 352, 352, 3))
        return step.lower(state, mem, frame, frame, sds((bs, 352, 352, 1)))

    def stream512():
        model = EMIPLong(config=EMIPShortConfig(inp_size=512),
                         memory_size=5, dtype=BF16)
        clips = 4
        img1 = sds((clips, 512, 512, 3))
        mem = jax.eval_shape(lambda: model.init_memory(clips))
        variables = jax.eval_shape(
            lambda k, a, b, m: model.init(k, a, b, m, False),
            key, img1, img1, mem)

        def step(variables, prev, cur, mem):
            mask, _, new_mem = model.apply(variables, prev, cur, mem,
                                           False)
            return mask, new_mem

        return jax.jit(step).lower(variables, img1, img1, mem)

    yield "graph:short_train_step[b5,352^2,bs=8]", short_train
    yield "graph:long_train_step[b5,352^2,bs=4,mem=5]", long_train
    yield "graph:stream512_step[b5,512^2,clips=4,mem=5]", stream512


def _compile(fn, args, trace_only=False):
    lowered = jax.jit(fn).lower(*args)
    if not trace_only:
        lowered.compile()


def _compile_grad(fn, args, argnums, trace_only=False):
    def loss(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x.astype(F32) ** 2) for x in leaves)

    lowered = jax.jit(jax.grad(loss, argnums=argnums)).lower(*args)
    if not trace_only:
        lowered.compile()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", default="", help="substring filter on case name")
    ap.add_argument("--no-grad", action="store_true",
                    help="forward compiles only")
    ap.add_argument("--trace-only", action="store_true",
                    help="abstract trace without compiling — shape/arg "
                         "debugging on CPU; does NOT check Mosaic lowering")
    ap.add_argument("--all", action="store_true",
                    help="also smoke default-OFF opt-in kernels")
    ap.add_argument("--kernels-only", action="store_true",
                    help="skip the whole-graph (train/stream step) cases")
    args = ap.parse_args()

    if jax.default_backend() != "tpu" and not args.trace_only:
        print("tpu_smoke: no TPU backend — interpreter mode proves nothing;"
              " aborting (rc=2)", file=sys.stderr)
        return 2

    failures = []
    n_run = 0
    for name, fn, avals, grad_argnums in _cases(include_optin=args.all):
        if args.k and args.k not in name:
            continue
        n_run += 1
        t0 = time.time()
        try:
            _compile(fn, avals, args.trace_only)
            status = f"fwd ok {time.time() - t0:6.1f}s"
            if grad_argnums is not None and not args.no_grad:
                t1 = time.time()
                _compile_grad(fn, avals, grad_argnums, args.trace_only)
                status += f"  grad ok {time.time() - t1:6.1f}s"
            print(f"  PASS {name:52s} {status}", flush=True)
        except Exception as e:  # noqa: BLE001 — report every failure
            failures.append(name)
            msg = str(e) or repr(e)
            # surface the informative line (Mosaic/XLA error), not the
            # axon HTTP wrapper
            lines = [ln for ln in msg.splitlines() if ln.strip()]
            key = next(
                (ln for ln in lines
                 if "Error" in ln or "error" in ln and "HTTP" not in ln),
                lines[0] if lines else "",
            )
            print(f"  FAIL {name:52s} {key.strip()[:300]}", flush=True)
            if len(failures) <= 3:
                traceback.print_exc(limit=8)

    if not args.kernels_only:
        for name, build in _graph_cases():
            if args.k and args.k not in name:
                continue
            n_run += 1
            t0 = time.time()
            try:
                lowered = build()
                status = f"lower ok {time.time() - t0:6.1f}s"
                if not args.trace_only:
                    t1 = time.time()
                    lowered.compile()
                    status += f"  compile ok {time.time() - t1:6.1f}s"
                print(f"  PASS {name:52s} {status}", flush=True)
            except Exception:  # noqa: BLE001 — report every failure
                failures.append(name)
                print(f"  FAIL {name}", flush=True)
                traceback.print_exc(limit=12)

    print(f"\ntpu_smoke: {n_run - len(failures)}/{n_run} cases compiled")
    if failures:
        print("FAILED:", *failures, sep="\n  ")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
