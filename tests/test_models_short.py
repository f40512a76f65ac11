"""Shape/behavior tests for the short-term two-stream model (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emip_tpu.models.emip_short import EMIPShort, SegNetwork
from tests.helpers import tiny_short_config


@pytest.fixture(scope="module")
def tiny_model_and_params():
    cfg = tiny_short_config(inp_size=64)
    model = EMIPShort(config=cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(rng, img, img, train=False)
    return model, variables


def test_short_forward_shapes(tiny_model_and_params):
    model, variables = tiny_model_and_params
    img1 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)), jnp.float32)
    img2 = img1 + 0.01

    mask, flow_fw, flow_bw = model.apply(variables, img1, img2, train=False)
    assert mask.shape == (2, 64, 64, 1)
    # eval mode: one (convex-upsampled) flow prediction
    assert len(flow_fw) == len(flow_bw) == 1
    assert flow_fw[0].shape == (2, 64, 64, 2)
    assert np.isfinite(np.asarray(mask)).all()


def test_short_training_returns_intermediate_flows(tiny_model_and_params):
    model, variables = tiny_model_and_params
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out, mutated = model.apply(
        variables, img, img, train=True,
        rngs={"droppath": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    mask, flow_fw, flow_bw = out
    # training mode: pre-propagation bilinear + final convex predictions
    assert len(flow_fw) == 2
    assert all(f.shape == (1, 64, 64, 2) for f in flow_fw)
    assert "batch_stats" in mutated


def test_short_forward_jits(tiny_model_and_params):
    model, variables = tiny_model_and_params
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)

    @jax.jit
    def fwd(v, a, b):
        return model.apply(v, a, b, train=False)[0]

    m = fwd(variables, img, img)
    assert m.shape == (1, 64, 64, 1)


def test_seg_network_shapes():
    from tests.helpers import TINY_PVT
    from emip_tpu.models.backbones import register_backbone
    from emip_tpu.models.pvt_v2 import PVTv2

    register_backbone(
        "pvt_v2_tiny",
        lambda dtype: PVTv2(config=TINY_PVT, dtype=dtype),
        TINY_PVT.embed_dims,
    )
    model = SegNetwork(backbone_name="pvt_v2_tiny", channel=8)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    logits = model.apply(variables, img, train=False)
    assert logits.shape == (1, 64, 64, 1)


def test_pixel_shuffle_matches_torch():
    """NHWC pixel shuffle/unshuffle == torch channel ordering."""
    import numpy as np
    import torch

    from emip_tpu.models.common import pixel_shuffle, pixel_unshuffle

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 6, 16)).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    want = torch.nn.functional.pixel_shuffle(
        torch.from_numpy(x).permute(0, 3, 1, 2), 2
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    back = np.asarray(pixel_unshuffle(jnp.asarray(got), 2))
    np.testing.assert_allclose(back, x, rtol=1e-6, atol=1e-6)


def test_pixel_shuffle_down_up_shapes():
    import jax

    from emip_tpu.models.common import (
        PixelShuffleDownsample,
        PixelShuffleUpsample,
    )

    x = jnp.ones((1, 8, 8, 16))
    down = PixelShuffleDownsample(16)
    v = down.init(jax.random.PRNGKey(0), x)
    assert down.apply(v, x).shape == (1, 4, 4, 32)

    up = PixelShuffleUpsample(16)
    v = up.init(jax.random.PRNGKey(0), x)
    assert up.apply(v, x).shape == (1, 16, 16, 8)

def test_double_batch_backbone_knob_equivalence(tiny_model_and_params,
                                                monkeypatch):
    """EMIP_PVT_DOUBLE_BATCH=1 (one doubled-batch backbone call) must be
    numerically identical to the default per-frame calls: PVT normalizes
    per-sample (LayerNorm), so batch composition cannot change the math."""
    model, variables = tiny_model_and_params
    img1 = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 64, 64, 3)), jnp.float32)
    img2 = img1 + 0.05

    base = model.apply(variables, img1, img2, train=False)
    monkeypatch.setenv("EMIP_PVT_DOUBLE_BATCH", "1")
    doubled = model.apply(variables, img1, img2, train=False)
    for a, b in zip(jax.tree.flatten((base,))[0],
                    jax.tree.flatten((doubled,))[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
