"""Pipeline parallelism (emip_tpu/parallel/pipeline.py) equivalence tests.

The claim under test: ``pipeline_blocks`` over a ('data','model') mesh is
*numerically the sequential block scan* — values and gradients — while the
depth axis is genuinely sharded over 'model' and the batch over 'data'
(DP x PP in one jit). The reference has no pipeline path at all (DDP only,
reference train.py:185-219); equivalence is therefore asserted against the
single-device scan, same as the TP/FSDP tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from emip_tpu.parallel.pipeline import pipeline_blocks


def _mesh(data, model):
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def _sequential(block_fn, stacked_params, x):
    def one(a, p):
        return block_fn(p, a), None

    out, _ = jax.lax.scan(one, x, stacked_params)
    return out


# ---------------------------------------------------------------- toy MLP


def _mlp_block(p, x):
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + h @ p["w2"]


def _mlp_stack(layers, width, hidden, key):
    keys = jax.random.split(key, 3)
    return {
        "w1": 0.3 * jax.random.normal(keys[0], (layers, width, hidden)),
        "b1": 0.1 * jax.random.normal(keys[1], (layers, hidden)),
        "w2": 0.3 * jax.random.normal(keys[2], (layers, hidden, width)),
    }


@pytest.mark.parametrize("data,model,micro", [(2, 4, 2), (1, 8, 4)])
def test_pipeline_matches_sequential(data, model, micro):
    params = _mlp_stack(8, 16, 32, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    want = _sequential(_mlp_block, params, x)

    mesh = _mesh(data, model)
    got = pipeline_blocks(
        _mlp_block, params, x, mesh, num_microbatches=micro
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pipeline_grads_match_sequential():
    """jax.grad through the pipeline (ppermute transposes to the backward
    shift) equals the sequential gradient, for params and input."""
    params = _mlp_stack(8, 16, 32, jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 16))
    mesh = _mesh(2, 4)

    def loss_seq(params, x):
        return jnp.sum(_sequential(_mlp_block, params, x) ** 2)

    def loss_pp(params, x):
        out = pipeline_blocks(
            _mlp_block, params, x, mesh, num_microbatches=4
        )
        return jnp.sum(out ** 2)

    want_p, want_x = jax.grad(loss_seq, argnums=(0, 1))(params, x)
    got_p, got_x = jax.grad(loss_pp, argnums=(0, 1))(params, x)

    # gradient magnitudes are ~1e2-1e3 here; bound the error relative to
    # each tensor's scale (measured mismatch ~1e-6 relative)
    for k in want_p:
        w = np.asarray(want_p[k])
        np.testing.assert_allclose(
            np.asarray(got_p[k]), w,
            atol=1e-4 * max(np.abs(w).max(), 1.0), err_msg=k,
        )
    wx = np.asarray(want_x)
    np.testing.assert_allclose(
        np.asarray(got_x), wx, atol=1e-4 * np.abs(wx).max()
    )


def test_pipeline_stage_is_sharded():
    """The depth axis is genuinely distributed: each leaf's addressable
    shard covers L/S layers, not all of them."""
    params = _mlp_stack(8, 16, 32, jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 16))
    mesh = _mesh(2, 4)

    traced = jax.jit(
        lambda p, x: pipeline_blocks(
            _mlp_block, p, x, mesh, num_microbatches=4
        )
    ).lower(params, x).compile()
    # the compiled executable's input shardings split the depth axis
    in_sh = traced.input_shardings[0][0]["w1"]
    shard_shape = in_sh.shard_shape((8, 16, 32))
    assert shard_shape[0] == 2  # 8 layers / 4 stages


# ----------------------------------------------------- real PVT block stack


def test_pipeline_pvt_stage():
    """DP x PP over a stack of real PVTBlocks (the nn.scan stage layout of
    emip_tpu/models/pvt_v2.py): pipelined forward == sequential forward."""
    from emip_tpu.models.pvt_v2 import PVTBlock

    L, B, H, W, C = 4, 4, 8, 8, 32
    block = PVTBlock(dim=C, num_heads=2, mlp_ratio=2, sr_ratio=1)
    x = jax.random.normal(jax.random.PRNGKey(6), (B, H, W, C))

    keys = jax.random.split(jax.random.PRNGKey(7), L)
    per_layer = [
        block.init(k, x, 0.0, True)["params"] for k in keys
    ]
    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *per_layer
    )

    def block_fn(p, a):
        return block.apply({"params": p}, a, 0.0, True)[0]

    want = _sequential(block_fn, stacked, x)
    mesh = _mesh(2, 4)
    got = pipeline_blocks(block_fn, stacked, x, mesh, num_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_pipeline_rejects_indivisible_depth():
    params = _mlp_stack(6, 16, 32, jax.random.PRNGKey(8))
    x = jax.random.normal(jax.random.PRNGKey(9), (8, 16))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(
            _mlp_block, params, x, _mesh(2, 4), num_microbatches=4
        )
