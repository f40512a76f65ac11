#!/usr/bin/env python
"""Benchmark: frames/sec/chip of the flagship EMIP-short forward at 352^2.

Measures end-to-end inference throughput of the full two-stream pipeline
(PVTv2-B5 segmentation features for both frames, GMFlow CNN + transformer
matching, both prompt injections, correlation embedding, NCD decode) on one
chip in bfloat16, sweeping batch sizes and reporting the best.

Timing methodology (important under remote/async TPU runtimes where
``block_until_ready`` can return before execution): iterations are chained
through a data dependency (the next input is perturbed by the previous
output) and a scalar is fetched once at the end, forcing the whole chain to
execute; the constant host round-trip is eliminated by differencing two
chain lengths.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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
import time

REFERENCE_FPS_ESTIMATE = 10.0  # frames/sec, provisional (see docstring)


def bench(batch_sizes=(8, 16), n_short: int = 5, n_long: int = 25):
    # bs=16 measured best (232.7 vs 230.0 f/s at bs=8); both are swept and
    # the best reported. bs=1 latency is recorded in CLAUDE.md (6.4 ms/step)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig

    config = EMIPShortConfig()
    model = EMIPShort(config=config, dtype=jnp.bfloat16)
    size = config.inp_size

    init_img = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), init_img, init_img,
                           train=False)
    )()

    @jax.jit
    def chained(variables, image1, image2):
        """One forward; output perturbs the next input (data dependency).

        variables is an explicit argument: closing over ~340MB of params
        would bake them into the compile payload (rejected by remote
        runtimes with request-size limits).
        """
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
    rng = np.random.default_rng(0)
    for bs in batch_sizes:
        img1 = jnp.asarray(rng.standard_normal((bs, size, size, 3)),
                           jnp.float32)
        img2 = jnp.asarray(rng.standard_normal((bs, size, size, 3)),
                           jnp.float32)
        run_chain(img1, img2, 2)  # warmup / compile

        t0 = time.perf_counter()
        run_chain(img1, img2, n_short)
        t_short = time.perf_counter() - t0

        t0 = time.perf_counter()
        run_chain(img1, img2, n_long)
        t_long = time.perf_counter() - t0

        step_s = (t_long - t_short) / (n_long - n_short)
        fps = bs / step_s
        results[bs] = fps
        print(f"# bs={bs}: {fps:.2f} frames/s ({step_s * 1e3:.2f} ms/step, "
              f"RTT-corrected)")

    best_bs = max(results, key=results.get)
    return results[best_bs], best_bs


def main():
    fps, bs = bench()
    print(json.dumps({
        "metric": "frames/sec/chip, EMIP-short two-stream inference "
                  "@352^2 bf16 (best batch={})".format(bs),
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    main()
