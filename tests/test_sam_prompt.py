"""Shape/registration tests for the SAM-style prompt decoders.

These heads are dead alternates in the reference (PromptInteract.py:12-173,
superseded by the MDTA Injector) — the tests pin their shape contracts and
that the reference ctor's registered-but-unused submodules exist in the
param tree (flow_head, motion_tokens, upscaler/hyper-MLPs on Interact).
"""

import jax
import jax.numpy as jnp
import pytest

from emip_tpu.models.sam_prompt import (
    FlowHead,
    Interact,
    MLP,
    PatchEmbed,
    PositionEmbeddingRandom,
    PromptGenBlock,
    PromptInteract,
)


@pytest.fixture(scope="module")
def inputs():
    k = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(k)
    img = jax.random.normal(k1, (2, 44, 44, 128), jnp.float32)
    flow = jax.random.normal(k2, (2, 44, 44, 128), jnp.float32)
    return img, flow


def test_prompt_interact_shapes(inputs):
    img, flow = inputs
    m = PromptInteract()
    params = m.init(jax.random.PRNGKey(1), img, flow)
    out = m.apply(params, img, flow)
    assert out.shape == (2, 44, 44, 128)
    assert jnp.isfinite(out).all()
    p = params["params"]
    # reference ctor registrations that the forward never touches
    assert "flow_head" in p and "motion_tokens" in p
    assert {f"output_hypernetworks_mlps_{i}" for i in range(4)} <= set(p)


def test_interact_shapes(inputs):
    img, flow = inputs
    m = Interact()
    params = m.init(jax.random.PRNGKey(1), img, flow)
    out = m.apply(params, img, flow)
    assert out.shape == (2, 44, 44, 128)
    assert jnp.isfinite(out).all()
    p = params["params"]
    for name in ("flow_tokens", "mask_tokens", "motion_tokens", "flow_head",
                 "output_upscaling", "mask_downscaling"):
        assert name in p, name


def test_patch_embed_token_count(inputs):
    img, _ = inputs
    m = PatchEmbed(patch_size=8, embed_dim=128)
    params = m.init(jax.random.PRNGKey(0), img)
    # 44 // 8 = 5 -> 25 patches (VALID conv, reference PatchEmbed :263)
    assert m.apply(params, img).shape == (2, 25, 128)


def test_position_embedding_grid():
    m = PositionEmbeddingRandom(64)
    params = m.init(jax.random.PRNGKey(0), 44)
    pe = m.apply(params, 44)
    assert pe.shape == (44, 44, 128)
    # sin/cos outputs are bounded
    assert float(jnp.abs(pe).max()) <= 1.0 + 1e-6


def test_flow_head_and_prompt_gen(inputs):
    img, _ = inputs
    fh = FlowHead(hidden_dim=256)
    p = fh.init(jax.random.PRNGKey(0), img)
    assert fh.apply(p, img).shape == (2, 44, 44, 2)

    x = jnp.ones((2, 16, 16, 192))
    pg = PromptGenBlock(prompt_dim=128, prompt_len=5, prompt_size=96,
                        lin_dim=192)
    p = pg.init(jax.random.PRNGKey(0), x)
    assert pg.apply(p, x).shape == (2, 16, 16, 128)


def test_mlp_layer_names():
    m = MLP(hidden_dim=128, output_dim=16, num_layers=3)
    params = m.init(jax.random.PRNGKey(0), jnp.ones((2, 128)))
    assert set(params["params"]) == {"layers_0", "layers_1", "layers_2"}


# ---- oracle parity vs the reference torch implementation ----

import os
import sys

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "model"))

ARGS = {
    "inp_size": 352,
    "update": {
        "transformer_dim": 128,
        "num_mask_tokens": 4,
        "prompt_embed_dim": 128,
        "patch_size": 8,
        "flow_head_hidden_dim": 128,
        "flow_head_depth": 3,
        "mask_in_chans": 16,
        "motion_embed_dim": 128,
    },
}


@pytest.fixture(scope="module")
def oracle_module():
    if not HAS_REF:
        pytest.skip("reference not mounted")
    import importlib

    import torch  # noqa: F401

    if "timm" not in sys.modules:
        import types

        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.to_2tuple = lambda x: (x, x) if not isinstance(x, tuple) else x
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    sys.path.insert(0, REF)
    try:
        common = importlib.import_module("model.EMIP_short.motion.common")
        transformer = importlib.import_module(
            "model.EMIP_short.motion.transformer"
        )
        stub_root = "model.EPFlow_1_feature"
        for name, mod in {
            stub_root: importlib.import_module("model.EMIP_short"),
            stub_root + ".motion": importlib.import_module(
                "model.EMIP_short.motion"
            ),
            stub_root + ".motion.common": common,
            stub_root + ".motion.transformer": transformer,
        }.items():
            sys.modules.setdefault(name, mod)
        return importlib.import_module(
            "model.EMIP_short.motion.PromptInteract"
        )
    finally:
        sys.path.pop(0)


def _parity(oracle, ours, depth):
    import numpy as np
    import torch
    from flax import traverse_util

    from emip_tpu.convert.torch_import import convert_sam_prompt_state

    oracle.eval()
    converted = convert_sam_prompt_state(oracle.state_dict(), depth=depth)

    img = jnp.zeros((2, 44, 44, 128), jnp.float32)
    variables = ours.init(jax.random.PRNGKey(0), img, img)
    want = set(traverse_util.flatten_dict(variables["params"]))
    got = set(traverse_util.flatten_dict(converted))
    assert want == got, (sorted(want - got)[:4], sorted(got - want)[:4])

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((2, 128, 44, 44)).astype(np.float32)
    flow = rng.standard_normal((2, 128, 44, 44)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(emb), torch.from_numpy(flow)).numpy()
    out = ours.apply(
        {"params": converted},
        np.transpose(emb, (0, 2, 3, 1)),
        np.transpose(flow, (0, 2, 3, 1)),
    )
    got_out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got_out, ref, rtol=2e-3, atol=2e-3)


def test_prompt_interact_parity(oracle_module):
    import torch

    torch.manual_seed(0)
    oracle = oracle_module.PromptInteract(ARGS)
    _parity(oracle, PromptInteract(), depth=2)


def test_interact_parity(oracle_module):
    import torch

    torch.manual_seed(1)
    oracle = oracle_module.Interact(ARGS)
    _parity(oracle, Interact(), depth=1)
