#!/usr/bin/env python
"""Long-model (LTM) per-frame training-step throughput on the real chip.

One step = frozen short-term two-stream forward (stop_gradient), LTM
memorize + masked memory read, long decoder head, hybrid-E loss, backward
over the trainable head, AdamW — the reference train_long.py:49-63 inner
loop as a single device program. The reference effectively ran bs=1
(whole-video batch elements); the fixed-shape memory makes the step
batchable, so BS>1 measures multi-video streaming training.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.train.long import build_long_state, make_long_train_step
from emip_tpu.utils.config import load_config

BS = int(os.environ.get("BS", "4"))
SIZE = 352


from tools._timing import timed as _timed


def timed(fn, args, n=6):
    return _timed(fn, args, n)


def main():
    cfg = load_config(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "emip.yaml"))
    model, tx, state = build_long_state(cfg)

    rng = np.random.default_rng(0)
    img_prev = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)),
                           jnp.float32)
    img_cur = jnp.asarray(rng.standard_normal((BS, SIZE, SIZE, 3)),
                          jnp.float32)
    gt = jnp.asarray(rng.uniform(size=(BS, SIZE, SIZE, 1)) > 0.5,
                     jnp.float32)
    mem = model.init_memory(BS)

    step = make_long_train_step(model, tx)

    def state_copy(st):
        # the step donates its state/mem arguments; time on fresh copies
        return jax.tree_util.tree_map(
            lambda x: x + 0 if hasattr(x, "dtype") else x, st)

    def chain(k):
        s = state_copy(state)
        m = model.init_memory(BS)
        t0 = time.perf_counter()
        loss = None
        for _ in range(k):
            s, m, metrics = step(s, m, img_prev, img_cur, gt)
            loss = metrics["loss"]
        _ = float(loss)
        return time.perf_counter() - t0

    chain(1)  # compile
    # median of 5 chain-pairs with a long (n=24) chain — a single pair
    # has a heavy tunnel tail (observed 2.3/55.5/826.4 ms for this very
    # program, round 5), and short chains leave +/-15 ms of between-fetch
    # RTT jitter on a ~21 ms step (round-5 session-2; same fix as
    # bench.py)
    reps = []
    for _ in range(5):
        t1 = chain(2)
        tn = chain(2 + 24)
        reps.append((tn - t1) / 24)
    t = sorted(reps)[2]
    print(f"long train step bs={BS}: {t*1e3:.1f} ms -> "
          f"{BS/t:.1f} frames/s (reps {[round(r*1e3, 1) for r in reps]})")


if __name__ == "__main__":
    main()
