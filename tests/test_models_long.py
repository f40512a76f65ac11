"""Long-term model tests: memory ring semantics, step shapes, scan_video,
and frozen-short-term training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emip_tpu.models.emip_long import EMIPLong
from emip_tpu.models.ltm import MemoryState, memory_read
from tests.helpers import tiny_short_config


def test_memory_state_ring():
    state = MemoryState.zeros(1, 3, 4, 4, 8, 8)
    assert not bool(state.valid.any())
    keys = [jnp.full((1, 4, 4, 8), float(i)) for i in range(5)]
    for i, k in enumerate(keys):
        state = state.push(k, k)
        assert int(state.valid.sum()) == min(i + 1, 3)
    # after 5 pushes into 3 slots: slots hold entries 2, 3, 4 (last 3)
    np.testing.assert_allclose(np.asarray(state.keys[0, 0, 0, 0, 0]), 2.0)
    np.testing.assert_allclose(np.asarray(state.keys[0, 2, 0, 0, 0]), 4.0)


def test_memory_read_masks_invalid_slots():
    state = MemoryState.zeros(1, 4, 2, 2, 8, 8)
    # one valid slot with value 7; invalid slots filled with garbage
    garbage = jnp.full((1, 4, 2, 2, 8), 123.0)
    state = state._replace(keys=garbage, values=garbage)
    state = state.push(jnp.ones((1, 2, 2, 8)), jnp.full((1, 2, 2, 8), 7.0))
    q_key = jnp.ones((1, 2, 2, 8))
    q_val = jnp.zeros((1, 2, 2, 8))
    out = memory_read(state, q_key, q_val)
    assert out.shape == (1, 2, 2, 16)
    # read must come only from the single valid slot (value 7), not garbage
    np.testing.assert_allclose(np.asarray(out[..., :8]), 7.0, rtol=1e-5)


@pytest.fixture(scope="module")
def long_model():
    cfg = tiny_short_config(inp_size=64)
    model = EMIPLong(config=cfg, memory_size=3)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mem = model.init_memory(1)
    variables = model.init(jax.random.PRNGKey(0), img, img, mem, False)
    return model, variables


def test_long_step_shapes_and_memory_detached(long_model):
    model, variables = long_model
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    img1 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    mem = model.init_memory(1)

    mask_long, mask_short, new_mem = model.apply(
        variables, img0, img1, mem, False
    )
    assert mask_long.shape == (1, 64, 64, 1)
    assert mask_short.shape == (1, 64, 64, 1)
    assert int(new_mem.valid.sum()) == 1
    assert np.isfinite(np.asarray(mask_long)).all()


def test_long_scan_video(long_model):
    model, variables = long_model
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.standard_normal((1, 4, 64, 64, 3)), jnp.float32)
    masks = model.apply(
        variables, frames,
        method=lambda m, f: m.scan_video(f),
    )
    assert masks.shape == (1, 4, 64, 64, 1)
    assert np.isfinite(np.asarray(masks)).all()


def test_long_train_step_freezes_short_term(long_model):
    from emip_tpu.train.long import make_long_train_step
    from emip_tpu.train.state import (
        SHORT_TERM_FREEZE,
        TrainState,
        build_optimizer,
    )

    model, variables = long_model
    tx = build_optimizer(learning_rate=1e-3)
    state = TrainState.create(variables, tx, SHORT_TERM_FREEZE)

    from flax import traverse_util

    assert all(
        "short_term" in k
        for k in traverse_util.flatten_dict(state.frozen)
    )
    assert all(
        "short_term" not in k
        for k in traverse_util.flatten_dict(state.params)
    )

    step = make_long_train_step(model, tx)
    rng = np.random.default_rng(2)
    img0 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    img1 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    gt = jnp.asarray(
        rng.uniform(size=(1, 64, 64, 1)) > 0.5, jnp.float32
    )
    mem = model.init_memory(1)
    frozen_before = jax.tree_util.tree_map(np.asarray, state.frozen)

    new_state, new_mem, metrics = step(state, mem, img0, img1, gt)
    assert np.isfinite(float(metrics["loss"]))
    assert int(np.asarray(new_mem.valid).sum()) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(frozen_before),
        jax.tree_util.tree_leaves(new_state.frozen),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
