"""End-to-end GMFlow parity: reference torch model (oracle) vs converted JAX.

Instantiates the reference GMFlow on CPU, exports its state dict, converts
via :mod:`emip_tpu.convert.torch_import`, and checks that flow fields,
correlation volume, and the CNN encoder agree on random inputs. This single
test covers the encoder, swin transformer, shifted-window masks, position
embedding, global matching, flow self-attention, and convex upsampling.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "model"))

pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

H = W = 16
C = 128
B = 1


@pytest.fixture(scope="module")
def oracle():
    import torch

    sys.path.insert(0, REF)
    try:
        from model.EMIP_short.motion.gmflow.gmflow import GMFlow as RefGMFlow
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    args = {
        "GMFlow": {
            "attn_splits_list": [2],
            "corr_radius_list": [-1],
            "prop_radius_list": [-1],
            "pred_bidir_flow": True,
        }
    }
    model = RefGMFlow(
        num_scales=1, upsample_factor=8, feature_channels=C,
        num_transformer_layers=6, args=args,
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(oracle):
    import jax

    from emip_tpu.convert.torch_import import convert_gmflow_state
    from emip_tpu.models.gmflow import GMFlow, GMFlowConfig

    cfg = GMFlowConfig(feature_channels=C, num_transformer_layers=6)
    model = GMFlow(config=cfg)
    import jax.numpy as jnp

    feat = jnp.zeros((B, H, W, C), jnp.float32)
    img = jnp.zeros((B, 64, 64, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        img,
        [feat],
        [feat],
        method=lambda m, im, a, b: (m.encode(im), m(a, b)),
    )
    converted = convert_gmflow_state(oracle.state_dict())

    from flax import traverse_util

    want = traverse_util.flatten_dict(variables["params"])
    got = traverse_util.flatten_dict(converted["params"])
    assert set(want) == set(got), (
        sorted(set(want) - set(got))[:5],
        sorted(set(got) - set(want))[:5],
    )
    for k in want:
        assert want[k].shape == got[k].shape, (k, want[k].shape, got[k].shape)
    return model, {"params": converted["params"]}


def test_encoder_parity(oracle, converted):
    import torch

    model, variables = converted
    rng = np.random.default_rng(0)
    img = rng.standard_normal((B, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        ref = oracle.backbone(torch.from_numpy(img))[0].numpy()

    got = model.apply(
        variables, np.transpose(img, (0, 2, 3, 1)), method=lambda m, x: m.encode(x)
    )[0]
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_full_flow_parity(oracle, converted):
    import torch

    model, variables = converted
    rng = np.random.default_rng(1)
    f0 = rng.standard_normal((B, C, H, W)).astype(np.float32)
    f1 = rng.standard_normal((B, C, H, W)).astype(np.float32)

    with torch.no_grad():
        ref_fw, ref_bw, ref_corr = oracle(
            [torch.from_numpy(f0)], [torch.from_numpy(f1)]
        )

    got_fw, got_bw, got_corr = model.apply(
        variables,
        [np.transpose(f0, (0, 2, 3, 1))],
        [np.transpose(f1, (0, 2, 3, 1))],
        training=False,
    )

    assert len(got_fw) == len(ref_fw) == 1
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_fw[0]), (0, 3, 1, 2)),
        ref_fw[0].numpy(), rtol=1e-3, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_bw[0]), (0, 3, 1, 2)),
        ref_bw[0].numpy(), rtol=1e-3, atol=2e-2,
    )
    # corr: reference [B, HW, h, w] vs ours [B, h, w, HW]; values span ~±25,
    # fp32 accumulation over 6 transformer layers gives ~3e-4 relative noise
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_corr), (0, 3, 1, 2)),
        ref_corr.numpy(), rtol=2e-3, atol=2e-2,
    )
