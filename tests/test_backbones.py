"""Alternate-backbone shape tests: PVT-v1, Res2Net-50 v1b, EfficientNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emip_tpu.models.backbones import available_backbones, create_backbone


def _run(name, size=64, train=False):
    model, channels = create_backbone(name)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    if train:
        out, _ = model.apply(variables, x, train=True,
                             rngs={"droppath": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
    else:
        out = model.apply(variables, x, train=False)
    return out, channels


def test_registry_covers_reference_zoo():
    names = available_backbones()
    for required in ("pvt_v2_b5", "pvt_v2_b2", "pvt_small",
                     "res2net50_26w_4s", "efficientnet_b1",
                     "efficientnet_b4"):
        assert required in names, (required, names)


def test_pvt_v1_small_shapes():
    out, channels = _run("pvt_small")
    assert len(out) == 4
    for i, (o, c) in enumerate(zip(out, channels)):
        stride = 4 * 2**i
        assert o.shape == (1, 64 // stride, 64 // stride, c)
    assert np.isfinite(np.asarray(out[0])).all()


def test_res2net_shapes():
    out, channels = _run("res2net50_26w_4s")
    assert len(out) == 4
    for i, (o, c) in enumerate(zip(out, channels)):
        stride = 4 * 2**i
        assert o.shape == (1, 64 // stride, 64 // stride, c)
    assert np.isfinite(np.asarray(out[0])).all()


@pytest.mark.parametrize("name", ["efficientnet_b1"])
def test_efficientnet_shapes(name):
    out, channels = _run(name)
    assert len(out) == 4
    for i, (o, c) in enumerate(zip(out, channels)):
        stride = 4 * 2**i
        assert o.shape == (1, 64 // stride, 64 // stride, c), (i, o.shape, c)
    assert np.isfinite(np.asarray(out[0])).all()


def test_dgnet_shapes():
    from emip_tpu.models.dgnet import DGNet

    model = DGNet(channel=32, arc="efficientnet_b1")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    pc, pg = model.apply(variables, x, train=False)
    assert pc.shape == (1, 64, 64, 1)
    assert pg.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(pc)).all()
