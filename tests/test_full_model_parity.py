"""Whole-model oracle parity: reference CoUpdater (torch) vs EMIPShort (JAX).

The strongest accuracy-parity statement available without datasets: build the
assembled reference model (model/EMIP_short/model.py:33-102) on CPU at the
real 352^2 / 128-d / 1936-token glue shapes (PVT depths reduced to keep the
CPU oracle tractable — every stage channel, injector dim, conv_corr width and
correlation-volume shape stays real), convert its state dict with
``convert_emip_short_state``, and assert mask logits + both flow fields match
the torch forward. This covers the two-stream glue the per-component parity
tests cannot: backbone-stage wiring, camouflage feeder / motion collector
placement, conv_corr, DR chain and NCD assembly.
"""

import numpy as np
import pytest

from tests.ref_oracle import (
    has_reference,
    import_reference,
    make_reduced_b5_factory,
    reference_model_args,
)

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference not mounted"
)

DEPTHS = (1, 1, 2, 1)
SIZE = 352  # the reference hardcodes 44*44 glue (model.py:59); 352 only


@pytest.fixture(scope="module")
def oracle():
    import torch

    model_mod = import_reference("model.EMIP_short.model")
    pvt_v2, factory = make_reduced_b5_factory(DEPTHS)
    orig = pvt_v2.pvt_v2_b5
    pvt_v2.pvt_v2_b5 = factory
    try:
        torch.manual_seed(0)
        model = model_mod.CoUpdater(reference_model_args())
    finally:
        pvt_v2.pvt_v2_b5 = orig
    model.eval()

    # randomize stats/temperatures that default to identity-ish values so
    # the comparison actually exercises them
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0.0, 0.2, generator=gen)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5, generator=gen)
        for name, p in model.named_parameters():
            if name.endswith("temperature"):
                p.uniform_(0.5, 1.5, generator=gen)
    return model


@pytest.fixture(scope="module")
def converted(oracle):
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from emip_tpu.convert.torch_import import convert_emip_short_state
    from emip_tpu.models.backbones import register_backbone
    from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
    from emip_tpu.models.pvt_v2 import PVTv2, PVTv2Config

    pvt_cfg = PVTv2Config(depths=DEPTHS, remat=False)
    register_backbone(
        "pvt_v2_b5_reduced",
        lambda dtype: PVTv2(config=pvt_cfg, dtype=dtype),
        pvt_cfg.embed_dims,
    )
    cfg = EMIPShortConfig(backbone_name="pvt_v2_b5_reduced", inp_size=SIZE)
    model = EMIPShort(config=cfg)

    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)

    conv = convert_emip_short_state(oracle.state_dict(), depths=DEPTHS)

    for coll in ("params", "batch_stats"):
        want = traverse_util.flatten_dict(variables[coll])
        got = traverse_util.flatten_dict(conv[coll])
        assert set(want) == set(got), (
            coll,
            sorted(set(want) - set(got))[:6],
            sorted(set(got) - set(want))[:6],
        )
        for k in want:
            assert want[k].shape == got[k].shape, (
                coll, k, want[k].shape, got[k].shape,
            )
    return model, conv


def test_full_model_parity(oracle, converted):
    import torch

    model, variables = converted

    rng = np.random.default_rng(2)
    img1 = rng.standard_normal((1, 3, SIZE, SIZE)).astype(np.float32)
    img2 = rng.standard_normal((1, 3, SIZE, SIZE)).astype(np.float32)

    with torch.no_grad():
        ref_mask, ref_fw, ref_bw = oracle(
            torch.from_numpy(img1), torch.from_numpy(img2)
        )

    mask, flow_fw, flow_bw = model.apply(
        variables,
        np.transpose(img1, (0, 2, 3, 1)),
        np.transpose(img2, (0, 2, 3, 1)),
        train=False,
    )

    assert len(flow_fw) == len(ref_fw) and len(flow_bw) == len(ref_bw)
    np.testing.assert_allclose(
        np.transpose(np.asarray(flow_fw[-1]), (0, 3, 1, 2)),
        ref_fw[-1].numpy(),
        rtol=1e-3, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(flow_bw[-1]), (0, 3, 1, 2)),
        ref_bw[-1].numpy(),
        rtol=1e-3, atol=2e-2,
    )
    # mask logits: fp32 end to end; several conv/BN layers of accumulation
    np.testing.assert_allclose(
        np.transpose(np.asarray(mask), (0, 3, 1, 2)),
        ref_mask.numpy(),
        rtol=1e-3, atol=1e-2,
    )
