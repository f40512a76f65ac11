"""Tensor-parallel / FSDP sharding tests.

The reference scales only via DDP (every GPU holds the whole model;
reference train.py:185-219). The TPU-native generalization is GSPMD over a
('data','model') mesh: parameters (and Adam moments) carry PartitionSpecs,
XLA partitions the matmuls and inserts the collectives. These tests prove,
on the 8-virtual-device CPU mesh, that

- the SAME jitted train step runs with TP-sharded / FSDP-sharded state,
- weights and optimizer moments are genuinely distributed (per-leaf specs),
- the resulting update is numerically the single-device update (the
  correctness claim: sharding choices change communication, not math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from emip_tpu.models.emip_short import EMIPShort
from emip_tpu.parallel.sharding import (
    leaf_partition_spec,
    sharded_state_and_batch,
    state_shardings,
)
from emip_tpu.train.short import make_short_train_step
from emip_tpu.train.state import GMFLOW_FREEZE, TrainState, build_optimizer
from tests.helpers import tiny_short_config

MIN_SIZE = 512  # tiny-config leaves are small; production default is 2**16


def _make_batch(n=8, size=64, seed=7):
    rng = np.random.default_rng(seed)
    return dict(
        image1=jnp.asarray(rng.standard_normal((n, size, size, 3)), jnp.float32),
        image2=jnp.asarray(rng.standard_normal((n, size, size, 3)), jnp.float32),
        gt=jnp.asarray(rng.uniform(size=(n, size, size, 1)) > 0.5, jnp.float32),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_short_config(inp_size=64)
    model = EMIPShort(config=cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    tx = build_optimizer(learning_rate=1e-3, weight_decay=1e-7, clip_value=0.5)
    state = TrainState.create(variables, tx, GMFLOW_FREEZE)
    step = make_short_train_step(model, tx, donate=False)

    batch = _make_batch()
    rng = jax.random.PRNGKey(3)
    ref_state, ref_metrics = step(state, batch, rng)
    return state, step, batch, rng, ref_state, ref_metrics


def _mesh(data, model):
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def _assert_matches_single_device(new_state, metrics, ref_state, ref_metrics):
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    # Same Adam sign-flip noise floor as the DDP-equivalence test: a ~1e-7
    # reduction-order difference in a near-zero grad can flip an element's
    # update by +-2*lr. Bound each element by 2.5x the learning rate.
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.params),
        jax.tree_util.tree_leaves(new_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2.5e-3
        )


def _sharded_leaf_count(tree, axis):
    n = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        spec = leaf.sharding.spec
        if any(ax == axis for ax in spec if ax is not None):
            n += 1
    return n


def test_leaf_partition_spec_rules():
    P = jax.sharding.PartitionSpec
    dense = np.zeros((64, 128))
    # column-parallel: out dim sharded on 'model'
    assert leaf_partition_spec(
        "['params']['attn']['q']['kernel']", dense,
        model_size=4, tp=True, min_size=512,
    ) == P(None, "model")
    # row-parallel names shard the in dim
    assert leaf_partition_spec(
        "['params']['mlp']['fc2']['kernel']", dense,
        model_size=4, tp=True, min_size=512,
    ) == P("model", None)
    # scanned conv [depth, kh, kw, in, out]: out is still dim -1
    conv = np.zeros((3, 3, 3, 16, 64))
    assert leaf_partition_spec(
        "['params']['stage3']['blocks']['mlp']['fc1']['kernel']", conv,
        model_size=4, tp=True, min_size=512,
    ) == P(None, None, None, None, "model")
    # non-divisible dims fall through to the other, then replicate
    odd = np.zeros((63, 130))
    assert leaf_partition_spec(
        "x['q']['kernel']", odd, model_size=4, tp=True, min_size=512
    ) == P()
    # small leaves replicate
    assert leaf_partition_spec(
        "x['q']['kernel']", np.zeros((8, 8)),
        model_size=4, tp=True, min_size=512,
    ) == P()
    # fsdp adds 'data' on the largest remaining divisible dim
    assert leaf_partition_spec(
        "['params']['attn']['q']['kernel']", dense,
        model_size=2, data_size=4, tp=True, fsdp=True, min_size=512,
    ) == P("data", "model")


def test_tensor_parallel_step_matches_single_device(setup):
    state, step, batch, rng, ref_state, ref_metrics = setup
    mesh = _mesh(data=2, model=4)
    tp_state, tp_batch = sharded_state_and_batch(
        state, batch, mesh, tp=True, min_size=MIN_SIZE
    )
    # the model is genuinely distributed: many leaves sharded on 'model'
    assert _sharded_leaf_count(tp_state.params, "model") >= 10
    assert _sharded_leaf_count(tp_state.opt_state, "model") >= 10

    new_state, metrics = step(tp_state, tp_batch, rng)
    _assert_matches_single_device(new_state, metrics, ref_state, ref_metrics)


def test_fsdp_step_matches_single_device(setup):
    state, step, batch, rng, ref_state, ref_metrics = setup
    mesh = _mesh(data=8, model=1)
    fs_state, fs_batch = sharded_state_and_batch(
        state, batch, mesh, tp=False, fsdp=True, min_size=MIN_SIZE
    )
    assert _sharded_leaf_count(fs_state.params, "data") >= 10
    # ZeRO claim: Adam moments are sharded too
    assert _sharded_leaf_count(fs_state.opt_state, "data") >= 10

    new_state, metrics = step(fs_state, fs_batch, rng)
    _assert_matches_single_device(new_state, metrics, ref_state, ref_metrics)


def test_sequence_parallel_step_matches_single_device(setup):
    """DP x SP: batch sharded on 'data' AND spatial H sharded on 'model'.

    Activation sharding, not weight sharding: XLA inserts halo exchanges
    for the convolutions and all-gathers where attention needs the full
    extent, and the update must still be the single-device one.
    """
    from emip_tpu.parallel.sharding import batch_partition_spec

    state, step, batch, rng, ref_state, ref_metrics = setup
    mesh = _mesh(data=2, model=4)
    sp_state, sp_batch = sharded_state_and_batch(
        state, batch, mesh, tp=False, sp=True, min_size=MIN_SIZE
    )
    P = jax.sharding.PartitionSpec
    # NB PartitionSpec('data','model') != P('data','model',None,None):
    # trailing Nones are significant in equality; specs here are 4-D NHWC
    assert batch_partition_spec(
        batch["image1"], model_size=4, sp=True
    ) == P("data", "model", None, None)
    for leaf in jax.tree_util.tree_leaves(sp_batch):
        assert leaf.sharding.spec == P("data", "model", None, None)

    new_state, metrics = step(sp_state, sp_batch, rng)
    _assert_matches_single_device(new_state, metrics, ref_state, ref_metrics)


def test_dp_tp_fsdp_combined(setup):
    """2-way data x 4-way model with FSDP on top: the full hybrid."""
    state, step, batch, rng, ref_state, ref_metrics = setup
    mesh = _mesh(data=2, model=4)
    hy_state, hy_batch = sharded_state_and_batch(
        state, batch, mesh, tp=True, fsdp=True, min_size=MIN_SIZE
    )
    shardings = state_shardings(
        state, mesh, tp=True, fsdp=True, min_size=MIN_SIZE
    )
    two_axis = [
        s.spec
        for s in jax.tree_util.tree_leaves(shardings)
        if "model" in s.spec and "data" in s.spec
    ]
    assert len(two_axis) >= 5  # some leaves sharded on BOTH axes

    new_state, metrics = step(hy_state, hy_batch, rng)
    _assert_matches_single_device(new_state, metrics, ref_state, ref_metrics)
