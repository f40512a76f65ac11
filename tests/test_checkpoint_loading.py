"""Checkpoint-loading integration: a real torch GMFlow .pth (exported from
the reference oracle) merges into an initialized EMIPShort variable tree via
the config load path, and orbax round-trips the TrainState."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "model"))


@pytest.fixture(scope="module")
def small_short_model():
    """EMIPShort with real 128-ch GMFlow but a 1-block-per-stage backbone."""
    import jax
    import jax.numpy as jnp

    from emip_tpu.models.backbones import register_backbone
    from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
    from emip_tpu.models.pvt_v2 import PVTv2, PVTv2Config

    cfg_pvt = PVTv2Config(
        embed_dims=(64, 128, 320, 512), num_heads=(1, 2, 5, 8),
        mlp_ratios=(2, 2, 2, 2), depths=(1, 1, 1, 1),
        sr_ratios=(8, 4, 2, 1), remat=False,
    )
    register_backbone(
        "pvt_v2_ckpt_test",
        lambda dtype: PVTv2(config=cfg_pvt, dtype=dtype),
        cfg_pvt.embed_dims,
    )
    cfg = EMIPShortConfig(backbone_name="pvt_v2_ckpt_test", channel=32,
                          inp_size=64, include_dead_modules=False)
    model = EMIPShort(config=cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    return model, cfg, variables


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_flow_path_checkpoint_merges(small_short_model, tmp_path):
    import torch

    sys.path.insert(0, REF)
    try:
        from model.EMIP_short.motion.gmflow.gmflow import GMFlow as RefGMFlow
    finally:
        sys.path.pop(0)

    torch.manual_seed(1)
    args = {"GMFlow": {"attn_splits_list": [2], "corr_radius_list": [-1],
                       "prop_radius_list": [-1], "pred_bidir_flow": True}}
    ref = RefGMFlow(num_scales=1, upsample_factor=8, feature_channels=128,
                    num_transformer_layers=6, args=args)
    ckpt_path = str(tmp_path / "gmflow_things_like.pth")
    torch.save({"model": ref.state_dict()}, ckpt_path)

    _, cfg, variables = small_short_model

    class _Load:
        path = None
        flow_path = ckpt_path

    class _Cfg:
        load = _Load()
        model = cfg

    from emip_tpu.convert.torch_import import maybe_load_reference_weights

    merged = maybe_load_reference_weights(variables, _Cfg())

    got = np.asarray(
        merged["params"]["gmflow"]["backbone"]["conv2"]["kernel"]
    )
    want = ref.backbone.conv2.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # untouched subtree stays identical
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["dr1"]["reduce0"]["conv"]["kernel"]),
        np.asarray(variables["params"]["dr1"]["reduce0"]["conv"]["kernel"]),
    )


def test_orbax_roundtrip(small_short_model, tmp_path):
    import jax

    from emip_tpu.train.state import GMFLOW_FREEZE, TrainState, build_optimizer
    from emip_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    _, _, variables = small_short_model
    tx = build_optimizer()
    state = TrainState.create(variables, tx, GMFLOW_FREEZE)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, step=3)
    restored, step = restore_checkpoint(ckpt_dir, state)
    assert step == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
