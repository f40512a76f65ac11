"""PVTv2 checkpoint-conversion layout test.

Builds a synthetic torch-style state dict (distinct values per block),
converts it, and checks (a) the tree exactly matches a flax init of the
same config, (b) per-block tensors stack in block order on the leading
scan axis, (c) linear/conv layout transforms are applied.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from emip_tpu.convert.torch_import import convert_pvt_v2_state
from emip_tpu.models.pvt_v2 import PVTv2, PVTv2Config

CFG = PVTv2Config(
    embed_dims=(8, 16, 24, 32),
    num_heads=(1, 2, 3, 4),
    mlp_ratios=(2, 2, 2, 2),
    depths=(2, 3, 2, 2),
    sr_ratios=(8, 4, 2, 1),
    remat=False,
)


def _fake_torch_sd(cfg: PVTv2Config):
    """Torch-layout state dict with per-block-distinct values."""
    rng = np.random.default_rng(0)
    sd = {}

    def add(key, shape, base=None):
        arr = rng.standard_normal(shape).astype(np.float32)
        if base is not None:
            arr = arr * 0 + base  # constant blocks to check stacking order
        sd[key] = arr

    in_ch = 3
    for i in range(1, 5):
        dim = cfg.embed_dims[i - 1]
        patch = 7 if i == 1 else 3
        add(f"patch_embed{i}.proj.weight", (dim, in_ch, patch, patch))
        add(f"patch_embed{i}.proj.bias", (dim,))
        add(f"patch_embed{i}.norm.weight", (dim,))
        add(f"patch_embed{i}.norm.bias", (dim,))
        add(f"norm{i}.weight", (dim,))
        add(f"norm{i}.bias", (dim,))
        for j in range(cfg.depths[i - 1]):
            p = f"block{i}.{j}"
            add(f"{p}.norm1.weight", (dim,), base=float(j))
            add(f"{p}.norm1.bias", (dim,))
            add(f"{p}.norm2.weight", (dim,))
            add(f"{p}.norm2.bias", (dim,))
            add(f"{p}.attn.q.weight", (dim, dim))
            add(f"{p}.attn.q.bias", (dim,))
            add(f"{p}.attn.kv.weight", (2 * dim, dim))
            add(f"{p}.attn.kv.bias", (2 * dim,))
            add(f"{p}.attn.proj.weight", (dim, dim))
            add(f"{p}.attn.proj.bias", (dim,))
            if cfg.sr_ratios[i - 1] > 1:
                sr = cfg.sr_ratios[i - 1]
                add(f"{p}.attn.sr.weight", (dim, dim, sr, sr))
                add(f"{p}.attn.sr.bias", (dim,))
                add(f"{p}.attn.norm.weight", (dim,))
                add(f"{p}.attn.norm.bias", (dim,))
            hidden = dim * cfg.mlp_ratios[i - 1]
            add(f"{p}.mlp.fc1.weight", (hidden, dim))
            add(f"{p}.mlp.fc1.bias", (hidden,))
            add(f"{p}.mlp.dwconv.dwconv.weight", (hidden, 1, 3, 3))
            add(f"{p}.mlp.dwconv.dwconv.bias", (hidden,))
            add(f"{p}.mlp.fc2.weight", (dim, hidden))
            add(f"{p}.mlp.fc2.bias", (dim,))
        in_ch = dim
    return sd


def test_pvt_v2_conversion_layout():
    sd = _fake_torch_sd(CFG)
    converted = convert_pvt_v2_state(sd, CFG.depths)

    model = PVTv2(config=CFG)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    want = traverse_util.flatten_dict(variables["params"])
    got = traverse_util.flatten_dict(converted)
    assert set(want) == set(got), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5],
    )
    for k in want:
        assert want[k].shape == got[k].shape, (k, want[k].shape, got[k].shape)

    # stacking order: block j's norm1 scale is the constant j
    stage2_norm1 = got[("stage2", "norm1", "scale")]
    assert stage2_norm1.shape[0] == CFG.depths[1]
    for j in range(CFG.depths[1]):
        np.testing.assert_allclose(stage2_norm1[j], float(j))

    # layout transforms: linear transposed, conv OIHW->HWIO
    q_t = sd["block1.0.attn.q.weight"]
    np.testing.assert_array_equal(
        got[("stage1", "attn", "q", "kernel")][0], q_t.T
    )
    pe = sd["patch_embed1.proj.weight"]
    np.testing.assert_array_equal(
        got[("patch_embed1", "proj", "kernel")], pe.transpose(2, 3, 1, 0)
    )

    # converted params actually run
    out = model.apply({"params": converted}, x, train=False)
    assert out[-1].shape == (1, 2, 2, 32)
