"""MDTA Injector parity: reference torch module (oracle) vs converted JAX.

The reference's PromptInteract.py ships with broken imports
(``model.EPFlow_1_feature.*``, SURVEY.md §7.1); the oracle import aliases
those paths to the real ``model.EMIP_short.motion`` modules so the live
``Injector`` class can be instantiated and used as a golden reference for
both the flax implementation and the checkpoint converter.
"""

import importlib
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "model"))

pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")


@pytest.fixture(scope="module")
def oracle_injector():
    import torch

    # stub timm (absent in this env); the oracle only needs to_2tuple
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
        # alias the stale package names to the real modules (SURVEY §7.1)
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
        pi = importlib.import_module("model.EMIP_short.motion.PromptInteract")
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    inj = pi.Injector()
    inj.eval()
    # temperature defaults to ones; randomize for a stricter check
    with torch.no_grad():
        inj.transformer.attn.temperature.copy_(
            torch.rand_like(inj.transformer.attn.temperature) + 0.5
        )
    return inj


def test_injector_parity(oracle_injector):
    import jax
    import jax.numpy as jnp
    import torch
    from flax import traverse_util

    from emip_tpu.convert.torch_import import _injector_into, _Tree
    from emip_tpu.models.prompt import Injector

    model = Injector(dim=128)
    x = jnp.zeros((2, 8, 8, 128), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x)

    # convert oracle weights (state dict keys are 'transformer.*'; the
    # converter expects the enclosing-module prefix 'injector.*')
    sd = {f"injector.{k}": v for k, v in oracle_injector.state_dict().items()}
    t = _Tree()
    _injector_into(t, sd, "injector", "injector")
    converted = t.unflatten()["params"]["injector"]

    want = traverse_util.flatten_dict(variables["params"])
    got = traverse_util.flatten_dict(converted)
    assert set(want) == set(got), (
        sorted(set(want) - set(got))[:4], sorted(set(got) - set(want))[:4],
    )

    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 128, 8, 8)).astype(np.float32)
    b = rng.standard_normal((2, 128, 8, 8)).astype(np.float32)

    with torch.no_grad():
        ref = oracle_injector(torch.from_numpy(a), torch.from_numpy(b)).numpy()

    out = model.apply(
        {"params": converted},
        np.transpose(a, (0, 2, 3, 1)),
        np.transpose(b, (0, 2, 3, 1)),
    )
    got_out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got_out, ref, rtol=1e-4, atol=1e-4)
