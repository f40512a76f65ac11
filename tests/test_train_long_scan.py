"""K-frames-per-dispatch long training == K sequential per-frame steps.

``make_long_train_scan_step`` carries the math-equivalence claim for the
production ``long_frames_per_dispatch`` path (train/long.py): lax.scan
threads (state, memory) through the exact per-frame update, so losses,
updated params, optimizer state, and the memory ring must match the
frame-by-frame dispatch schedule (the reference's schedule,
train_long.py:49-63).
"""

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.models.emip_long import EMIPLong
from emip_tpu.train.long import (
    make_long_train_scan_step,
    make_long_train_step,
)
from emip_tpu.train.state import (
    SHORT_TERM_FREEZE,
    TrainState,
    build_optimizer,
)
from tests.helpers import tiny_short_config

SIZE = 64


def _build(memory_size=3):
    cfg = tiny_short_config(inp_size=SIZE)
    model = EMIPLong(config=cfg, memory_size=memory_size)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), img, img, model.init_memory(1), False
    )
    tx = build_optimizer(learning_rate=1e-3, weight_decay=1e-7,
                         clip_value=0.5)
    state = TrainState.create(variables, tx, SHORT_TERM_FREEZE)
    return model, tx, state


def test_scan_step_matches_sequential_frames():
    k, b = 3, 2
    model, tx, state = _build()
    rng = np.random.default_rng(11)
    frames = rng.standard_normal((b, k + 1, SIZE, SIZE, 3)).astype(np.float32)
    gts = (rng.uniform(size=(b, k + 1, SIZE, SIZE, 1)) > 0.5).astype(
        np.float32
    )

    step = make_long_train_step(model, tx, donate=False)
    mem = model.init_memory(b)
    st_seq = state
    losses_seq = []
    for t in range(1, k + 1):
        st_seq, mem, m = step(
            st_seq, mem, frames[:, t - 1], frames[:, t], gts[:, t]
        )
        losses_seq.append(float(m["loss"]))
    mem_seq = mem

    scan = make_long_train_scan_step(model, tx, donate=False)
    st_scan, mem_scan, m_scan = scan(
        state, model.init_memory(b),
        frames[:, :k], frames[:, 1 : k + 1], gts[:, 1 : k + 1],
    )

    np.testing.assert_allclose(
        float(m_scan["loss"]), losses_seq[-1], rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_scan["loss_mean"]), np.mean(losses_seq), rtol=1e-5
    )
    assert int(st_scan.step) == int(st_seq.step) == k

    for (pa, a), (_, bv) in zip(
        jax.tree_util.tree_leaves_with_path(st_seq.params),
        jax.tree_util.tree_leaves_with_path(st_scan.params),
    ):
        # scan-vs-unrolled compilation can reorder f32 reductions; Adam
        # amplifies near-zero-grad noise to ~lr per element (same bound
        # as test_train_step.py's DDP check, lr=1e-3 here)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bv), rtol=0, atol=2.5e-3,
            err_msg=jax.tree_util.keystr(pa),
        )
    for a, bv in zip(
        jax.tree_util.tree_leaves(mem_seq),
        jax.tree_util.tree_leaves(mem_scan),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bv), atol=1e-4
        )
