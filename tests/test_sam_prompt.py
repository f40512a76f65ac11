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
