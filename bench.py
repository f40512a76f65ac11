#!/usr/bin/env python
"""Benchmark: the whole perf story of the flagship EMIP-short/long models.

Sub-benchmarks (each RTT-corrected by chain differencing, see below):
  * inference frames/s at 352^2 bf16 (batch sweep) — the headline metric;
  * short train step ms + pairs/s at bs=8 (fwd both streams, hybrid-E +
    photometric flow losses, backward over trainable sub-tree, clip, AdamW);
  * long (LTM) train step ms + frames/s at bs=4;
  * 512^2 long-model streaming, STABLE metric name: aggregate frames/s at
    4 batched clips (r1 single-clip 57.6 / r2 55.6 f/s were different
    definitions; this one is fixed going forward);
  * MFU: XLA cost-analysis FLOPs x measured time / chip peak, for the
    inference forward and the train step.

Timing methodology (important under remote/async TPU runtimes where
``block_until_ready`` can return before execution): iterations are chained
through a data dependency (the next input is perturbed by the previous
output; train steps thread their state) and a scalar is fetched once at the
end, forcing the whole chain to execute; the constant host round-trip is
eliminated by differencing two chain lengths.

Prints ONE JSON line: the headline inference metric in the standard
{"metric", "value", "unit", "vs_baseline"} keys, with every other
sub-benchmark under "extra_metrics".

Baseline note: the reference publishes no throughput (BASELINE.md), and no
CUDA GPU exists in this environment to measure it. ``REFERENCE_FPS_ESTIMATE``
is a provisional, documented estimate of the torch reference's single-GPU
inference rate (two PVTv2-B5 passes + 6-layer flow transformer at 352^2,
bs=1 python-loop inference as the reference's test.py runs it, A100-class);
``vs_baseline`` is measured fps divided by this estimate, to be replaced by
a real CUDA measurement when hardware allows.
"""

from __future__ import annotations

import json
import os
import time
import traceback

REFERENCE_FPS_ESTIMATE = 10.0  # frames/sec, provisional (see docstring)
# bf16 peak of one TPU v5e chip (for MFU); override for other chips
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))

SIZE = 352


def _flops(jitted, *args) -> float | None:
    """XLA cost-analysis FLOPs of a jitted callable (None if unavailable)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def bench_inference(extra, batch_sizes=(8, 16, 24), n_short=5, n_long=25):
    """Batch sweep 8/16/24: measured r4, throughput saturates at bs=24
    (289.3 f/s, MFU 16.4%) and bs=32 is flat (288.5, 16.4%) — the binding
    constraint is per-token model efficiency (PVT fwd ~51% of the step),
    not batch amortization, so 32 isn't worth the extra bench time."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig

    config = EMIPShortConfig()
    model = EMIPShort(config=config, dtype=jnp.bfloat16)

    init_img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), init_img, init_img,
                           train=False)
    )()

    @jax.jit
    def chained(variables, image1, image2):
        # variables is an explicit argument: closing over ~340MB of params
        # would bake them into the compile payload (rejected by remote
        # runtimes with request-size limits).
        mask, _, _ = model.apply(variables, image1, image2, train=False)
        eps = jnp.tanh(jnp.mean(mask)) * 1e-6
        return image1 + eps, image2 + eps, jnp.mean(mask)

    def run_chain(img1, img2, n):
        a, b = img1, img2
        s = None
        for _ in range(n):
            a, b, s = chained(variables, a, b)
        return float(s)  # fetch forces execution of the whole chain

    results = {}
    step_ms = {}
    rng = np.random.default_rng(0)
    for bs in batch_sizes:
        img1 = jnp.asarray(rng.standard_normal((bs, SIZE, SIZE, 3)),
                           jnp.float32)
        img2 = jnp.asarray(rng.standard_normal((bs, SIZE, SIZE, 3)),
                           jnp.float32)
        run_chain(img1, img2, 2)  # warmup / compile

        t0 = time.perf_counter()
        run_chain(img1, img2, n_short)
        t_short = time.perf_counter() - t0

        t0 = time.perf_counter()
        run_chain(img1, img2, n_long)
        t_long = time.perf_counter() - t0

        step_s = (t_long - t_short) / (n_long - n_short)
        results[bs] = bs / step_s
        step_ms[bs] = step_s * 1e3
        print(f"# infer bs={bs}: {results[bs]:.2f} frames/s "
              f"({step_ms[bs]:.2f} ms/step, RTT-corrected)")

        flops = _flops(chained, variables, img1, img2)
        if flops is not None:
            mfu = flops / step_s / (PEAK_TFLOPS * 1e12) * 100
            extra[f"inference_mfu_pct_bs{bs}"] = round(mfu, 2)
            print(f"# infer bs={bs}: {flops / 1e12:.3f} TFLOP "
                  f"-> MFU {mfu:.1f}%")

    best_bs = max(results, key=results.get)
    extra["inference_ms_per_step_best"] = round(step_ms[best_bs], 2)
    return results[best_bs], best_bs


def bench_train_short(extra, bs=8, n=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
    from emip_tpu.train.short import make_short_train_step
    from emip_tpu.train.state import (
        GMFLOW_FREEZE,
        TrainState,
        build_optimizer,
    )

    model = EMIPShort(config=EMIPShortConfig(), dtype=jnp.bfloat16)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img, img, train=False)
    )()
    tx = build_optimizer()
    state = TrainState.create(variables, tx, GMFLOW_FREEZE)
    step = make_short_train_step(model, tx, donate=True)

    rng = np.random.default_rng(0)
    batch = dict(
        image1=jnp.asarray(rng.standard_normal((bs, SIZE, SIZE, 3)),
                           jnp.float32),
        image2=jnp.asarray(rng.standard_normal((bs, SIZE, SIZE, 3)),
                           jnp.float32),
        gt=jnp.asarray(rng.uniform(size=(bs, SIZE, SIZE, 1)) > 0.5,
                       jnp.float32),
    )

    # abstract avals for cost analysis, captured before donation kills
    # the concrete buffers
    def _aval(x):
        return (jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "shape") else x)

    avals = jax.tree_util.tree_map(_aval, (state, batch, jax.random.PRNGKey(0)))

    def run(k, state):
        # state threads through the chain: steps are data-dependent
        key = jax.random.PRNGKey(0)
        loss = None
        for _ in range(k):
            key, sk = jax.random.split(key)
            state, metrics = step(state, batch, sk)
            loss = metrics["loss"]
        return float(loss), state

    _, state = run(2, state)  # compile + warmup
    t0 = time.perf_counter()
    _, state = run(3, state)
    t1 = time.perf_counter()
    _, state = run(3 + n, state)
    t2 = time.perf_counter()
    step_s = ((t2 - t1) - (t1 - t0)) / n

    extra["train_ms_per_step_bs8"] = round(step_s * 1e3, 1)
    extra["train_pairs_per_s_bs8"] = round(bs / step_s, 1)
    print(f"# train bs={bs}: {step_s * 1e3:.1f} ms/step -> "
          f"{bs / step_s:.1f} pairs/s")

    # MFU of the whole train step (fwd+bwd+optimizer). Lowering with the
    # pre-captured abstract avals reproduces the already-compiled program,
    # so the persistent compilation cache makes this near-free.
    flops = _flops(step, *avals)
    if flops is not None:
        mfu = flops / step_s / (PEAK_TFLOPS * 1e12) * 100
        extra["train_mfu_pct_bs8"] = round(mfu, 2)
        print(f"# train bs={bs}: {flops / 1e12:.3f} TFLOP -> MFU {mfu:.1f}%")


def bench_train_long(extra, bs=4, n=24):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emip_tpu.train.long import build_long_state, make_long_train_step
    from emip_tpu.utils.config import load_config

    cfg = load_config(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "configs", "emip.yaml"))
    model, tx, state = build_long_state(cfg)

    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((bs, SIZE, SIZE, 3)), jnp.float32)
    cur = jnp.asarray(rng.standard_normal((bs, SIZE, SIZE, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(size=(bs, SIZE, SIZE, 1)) > 0.5, jnp.float32)
    step = make_long_train_step(model, tx)

    def copy(t):
        return jax.tree_util.tree_map(
            lambda x: x + 0 if hasattr(x, "dtype") else x, t)

    def chain(k):
        s = copy(state)
        m = model.init_memory(bs)
        t0 = time.perf_counter()
        loss = None
        for _ in range(k):
            s, m, metrics = step(s, m, prev, cur, gt)
            loss = metrics["loss"]
        _ = float(loss)
        return time.perf_counter() - t0

    chain(1)  # compile
    # median of 5 chain-pairs with a long (n=24) chain: a SINGLE pair has
    # a heavy tail over the tunnel (observed 2.3 / 55.5 / 826.4 ms for
    # the same program across fresh processes, round-5 reconcile;
    # BENCH_r04's 33.7 vs the clean-condition 20.7 was the same effect),
    # and at n=6 the between-fetch RTT jitter still scattered the
    # per-step estimate +/-15 ms (round-5 session-2 A/B logs) — the step
    # itself is only ~21 ms, so divide the jitter by a longer chain
    reps = []
    for _ in range(5):
        t1 = chain(2)
        tn = chain(2 + n)
        reps.append((tn - t1) / n)
    step_s = sorted(reps)[2]
    extra["train_long_ms_per_step_bs4"] = round(step_s * 1e3, 1)
    extra["train_long_frames_per_s_bs4"] = round(bs / step_s, 1)
    extra["train_long_ms_reps"] = [round(r * 1e3, 1) for r in reps]
    print(f"# long train bs={bs}: {step_s * 1e3:.1f} ms/step -> "
          f"{bs / step_s:.1f} frames/s (reps "
          f"{[round(r * 1e3, 1) for r in reps]})")

    # K-frames-per-dispatch scan option (cfg.long_frames_per_dispatch):
    # measured device-rate NEUTRAL on v5e (36.6 vs 33.5 ms/frame, round
    # 5) — the ~33 ms step is device-bound, not dispatch-bound — but the
    # option matters for deployments where per-step host dispatch is
    # expensive, so its rate is recorded alongside
    from emip_tpu.train.long import make_long_train_scan_step

    K = 8
    scan = make_long_train_scan_step(model, tx)
    prevs = jnp.repeat(prev[:, None], K, axis=1)
    curs = jnp.repeat(cur[:, None], K, axis=1)
    gts = jnp.repeat(gt[:, None], K, axis=1)

    def chain_scan(c):
        s = copy(state)
        m = model.init_memory(bs)
        t0 = time.perf_counter()
        loss = None
        for _ in range(c):
            s, m, metrics = scan(s, m, prevs, curs, gts)
            loss = metrics["loss"]
        _ = float(loss)
        return time.perf_counter() - t0

    chain_scan(1)  # compile
    reps = []
    for _ in range(5):
        t1 = chain_scan(1)
        tn = chain_scan(1 + 3)
        reps.append((tn - t1) / (3 * K))
    scan_s = sorted(reps)[2]
    extra["train_long_scan_ms_per_step_bs4"] = round(scan_s * 1e3, 1)
    extra["train_long_scan_k"] = K
    print(f"# long train bs={bs}, K={K} scan dispatch: "
          f"{scan_s * 1e3:.1f} ms/frame-step -> "
          f"{bs / scan_s:.1f} frames/s (reps "
          f"{[round(r * 1e3, 1) for r in reps]})")


def bench_stream512(extra, clip_counts=(4, 1), n=10):
    """512^2 long-model streaming at 4 batched clips (the STABLE headline,
    ``stream512_frames_per_s_4clip``) AND single-clip (regression guard —
    the r2 "42 vs 46.7" confusion came from comparing the two definitions;
    recording both every round makes that impossible to repeat)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emip_tpu.models.emip_long import EMIPLong
    from emip_tpu.models.emip_short import EMIPShortConfig

    size = 512
    cfg = EMIPShortConfig(inp_size=size)
    model = EMIPLong(config=cfg, memory_size=5, dtype=jnp.bfloat16)

    img = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img, img,
                           model.init_memory(1), False)
    )()

    # production streaming path: frame t's frozen encoding rides to
    # frame t+1 (step_cached) — each frame's backbone runs ONCE
    @jax.jit
    def encode(variables, img):
        return model.apply(variables, img,
                           method=lambda m, x: m.encode_frame(x))

    @jax.jit
    def step(variables, enc_prev, cur, mem):
        mask, enc_cur, new_mem = model.apply(
            variables, enc_prev, cur, mem, False,
            method=lambda m, e, x, s, t: m.step_cached(e, x, s, t),
        )
        eps = jnp.tanh(jnp.mean(mask)) * 1e-6
        return enc_cur, cur + eps, new_mem, jnp.mean(mask)

    rng = np.random.default_rng(0)
    for clips in clip_counts:
        mem = model.init_memory(clips)
        f0 = jnp.asarray(rng.standard_normal((clips, size, size, 3)),
                         jnp.float32)
        f1 = jnp.asarray(rng.standard_normal((clips, size, size, 3)),
                         jnp.float32)
        enc0 = encode(variables, f0)

        def run(k):
            enc, cur, m = enc0, f1, mem
            s = None
            for _ in range(k):
                enc, nxt, m, s = step(variables, enc, cur, m)
                cur = nxt
            return float(s)

        run(2)
        t0 = time.perf_counter()
        run(3)
        t1 = time.perf_counter()
        run(3 + n)
        t2 = time.perf_counter()
        step_s = ((t2 - t1) - (t1 - t0)) / n
        key = ("stream512_frames_per_s_4clip" if clips == 4
               else f"stream512_frames_per_s_{clips}clip")
        extra[key] = round(clips / step_s, 2)
        print(f"# 512^2 streaming, {clips} clip(s): {step_s * 1e3:.1f} "
              f"ms/frame -> {clips / step_s:.2f} aggregate frames/s")


def _device_watchdog(
        timeout_s: float = float(os.environ.get(
            "BENCH_DEVICE_TIMEOUT_S", "900"))):
    """Fail fast (exit 2) if the TPU backend can't initialize.

    During axon tunnel outages ``jax.devices()`` blocks indefinitely in a
    connect-retry loop; a hung bench run records nothing. Probe device
    init on a daemon thread and hard-exit with a diagnostic if it doesn't
    come up, so the driver sees a clean failure instead of a timeout.
    """
    import sys
    import threading

    done = threading.Event()

    def probe():
        import jax

        jax.devices()
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(f"# FATAL: no jax backend after {timeout_s:.0f}s "
              "(axon tunnel outage?) — aborting bench", file=sys.stderr)
        os._exit(2)


def main():
    _device_watchdog()
    extra = {}
    bs_list = tuple(int(b) for b in os.environ.get(
        "BENCH_INFER_BS", "8,16,24").split(","))
    fps, bs = bench_inference(extra, batch_sizes=bs_list)

    for name, fn in (
        ("train_short", bench_train_short),
        ("train_long", bench_train_long),
        ("stream512", bench_stream512),
    ):
        if os.environ.get("BENCH_SKIP_" + name.upper()):
            continue
        try:
            fn(extra)
        except Exception:
            print(f"# {name} sub-benchmark FAILED:")
            traceback.print_exc()
            extra[name + "_error"] = True

    print(json.dumps({
        "metric": "frames/sec/chip, EMIP-short two-stream inference "
                  "@352^2 bf16 (best batch={})".format(bs),
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 2),
        "extra_metrics": extra,
    }))


if __name__ == "__main__":
    main()
