"""Multi-device long-model training: DP over clips with the LTM memory
ring sharded on the clip axis matches the single-device step.

The reference's long trainer is a single-GPU python loop over clips
(train_long.py:32-91); the TPU-native version runs one clip per data-axis
slot with per-frame gradient sync inserted by GSPMD (train/long.py).
These tests carry the strict equivalence claim behind
``__graft_entry__._dryrun_long`` on the 8-virtual-device CPU slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from emip_tpu.models.emip_long import EMIPLong
from emip_tpu.parallel.mesh import shard_batch
from emip_tpu.train.long import make_long_train_step
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


def _clip_batch(n, t, seed=5):
    rng = np.random.default_rng(seed)
    frames = rng.standard_normal((n, t, SIZE, SIZE, 3)).astype(np.float32)
    gts = (rng.uniform(size=(n, t, SIZE, SIZE, 1)) > 0.5).astype(np.float32)
    return frames, gts


@pytest.mark.slow
def test_dp_long_steps_match_single_device():
    """Two frame-steps of an 8-clip group, batch+memory sharded over 8
    devices == the same two steps unsharded (loss and updated params)."""
    n = 8
    devices = jax.devices()[:n]
    assert len(devices) == n, "conftest must provision 8 virtual devices"
    mesh = Mesh(np.asarray(devices).reshape(n, 1), ("data", "model"))

    model, tx, state = _build()
    step = make_long_train_step(model, tx, donate=False)
    frames, gts = _clip_batch(n, t=3)

    # unsharded baseline: same group of clips on one device
    s_ref, mem_ref = state, model.init_memory(n)
    losses_ref = []
    for t in range(1, frames.shape[1]):
        s_ref, mem_ref, m = step(
            s_ref, mem_ref, frames[:, t - 1], frames[:, t], gts[:, t]
        )
        losses_ref.append(float(m["loss"]))

    s_dp = state
    mem = shard_batch(model.init_memory(n), mesh)
    losses = []
    for t in range(1, frames.shape[1]):
        batch = shard_batch((frames[:, t - 1], frames[:, t], gts[:, t]), mesh)
        s_dp, mem, m = step(s_dp, mem, *batch)
        losses.append(float(m["loss"]))

    np.testing.assert_allclose(losses, losses_ref, rtol=1e-5)
    # memory ring stays sharded (not replicated) across carried steps
    leaf = jax.tree_util.tree_leaves(mem)[0]
    assert "data" in str(leaf.sharding), leaf.sharding

    from flax import traverse_util

    ref = traverse_util.flatten_dict(s_ref.params)
    got = traverse_util.flatten_dict(s_dp.params)
    assert set(ref) == set(got)
    for k in ref:
        # same Adam-step tolerance rationale as the short DDP test:
        # reduction-order noise can flip a near-zero grad element's update
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=0, atol=2.5e-3,
            err_msg="/".join(k),
        )


def test_clip_groups_truncate_and_drop():
    """_clip_groups stacks to the group-min length and drops remainders."""
    from emip_tpu.train.long import _clip_groups

    clips = [
        dict(frames=np.zeros((t, 4, 4, 3), np.float32),
             masks=np.zeros((t, 4, 4, 1), np.float32))
        for t in (5, 3, 4, 6, 2)
    ]
    groups = list(_clip_groups(iter(clips), group=2, max_videos=None,
                               max_frames=None))
    assert len(groups) == 2  # 5th clip dropped (partial group)
    assert groups[0][0].shape == (2, 3, 4, 4, 3)  # min(5, 3)
    assert groups[1][0].shape == (2, 4, 4, 4, 3)  # min(4, 6)

    capped = list(_clip_groups(iter(clips), group=1, max_videos=2,
                               max_frames=3))
    assert len(capped) == 2
    assert capped[0][0].shape == (1, 3, 4, 4, 3)  # 5 capped to 3
    assert capped[1][1].shape == (1, 3, 4, 4, 1)
