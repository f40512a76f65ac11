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


def test_production_pvt_defaults_track_exact_config():
    """PVT_V2_VARIANTS production defaults (poly_native GELU +
    save_attn_gelu remat) must stay numerically equivalent to the plain
    exact-GELU/full-remat PVTv2Config the oracle-parity tests use: the
    remat policy may never change values, and the polynomial GELU's
    |err| <= 2.3e-4 bound must hold through a full backbone forward."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from emip_tpu.models.pvt_v2 import PVT_V2_VARIANTS, PVTv2, PVTv2Config

    prod_cfg = PVT_V2_VARIANTS["pvt_v2_b0"]
    assert prod_cfg.ffn_gelu == "poly_native"
    assert prod_cfg.remat_policy == "save_attn_gelu"
    exact_cfg = PVTv2Config(
        depths=prod_cfg.depths, embed_dims=prod_cfg.embed_dims,
        num_heads=prod_cfg.num_heads, sr_ratios=prod_cfg.sr_ratios,
        mlp_ratios=prod_cfg.mlp_ratios,
    )
    assert exact_cfg.ffn_gelu == "exact" and exact_cfg.remat_policy is None
    # same param tree: only numerics knobs differ
    assert dataclasses.replace(
        prod_cfg, ffn_gelu="exact", remat_policy=None) == exact_cfg

    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = PVTv2(config=exact_cfg, dtype=jnp.float32).init(
        jax.random.PRNGKey(0), x)
    outs_exact = PVTv2(config=exact_cfg, dtype=jnp.float32).apply(variables, x)
    outs_prod = PVTv2(config=prod_cfg, dtype=jnp.float32).apply(variables, x)
    for a, b in zip(outs_exact, outs_prod):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 2e-3, err
