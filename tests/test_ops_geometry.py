"""Golden tests: warping/sampling vs torch.grid_sample (align_corners=True)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from emip_tpu.ops.geometry import (
    bilinear_sample,
    coords_grid,
    flow_warp,
    forward_backward_consistency,
)
from emip_tpu.ops.warp import (
    flow_warp_loss,
    forward_splat_density,
    occlusion_mask_backward,
    occlusion_mask_bidirection,
)

RNG = np.random.default_rng(1)


def _torch_grid_sample(img_nhwc, coords_xy, padding):
    """Reference sampler: pixel coords -> normalized grid_sample a_c=True."""
    img = torch.from_numpy(img_nhwc).permute(0, 3, 1, 2)
    n, c, h, w = img.shape
    coords = torch.from_numpy(coords_xy)
    gx = 2.0 * coords[..., 0] / (w - 1) - 1.0
    gy = 2.0 * coords[..., 1] / (h - 1) - 1.0
    grid = torch.stack([gx, gy], dim=-1)
    out = F.grid_sample(img, grid, mode="bilinear", padding_mode=padding,
                        align_corners=True)
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("channels", [3, 4])  # 3 -> split 8-lane tables,
def test_bilinear_sample_matches_grid_sample(padding, channels):  # 4 -> wide
    img = RNG.standard_normal((2, 13, 17, channels)).astype(np.float32)
    coords = (RNG.uniform(-3, 20, size=(2, 9, 11, 2))).astype(np.float32)
    got = np.asarray(bilinear_sample(img, coords, padding_mode=padding))
    want = _torch_grid_sample(img, coords, padding)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_flow_warp_identity():
    img = RNG.standard_normal((1, 8, 8, 3)).astype(np.float32)
    zero_flow = np.zeros((1, 8, 8, 2), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(flow_warp(img, zero_flow)), img, rtol=1e-5, atol=1e-5
    )


def test_flow_warp_shift():
    # flow of (+1, 0) means sample from x+1: output col j = input col j+1
    img = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    flow = np.zeros((1, 4, 4, 2), dtype=np.float32)
    flow[..., 0] = 1.0
    out = np.asarray(flow_warp(img, flow))
    np.testing.assert_allclose(out[0, :, :3, 0], img[0, :, 1:, 0])
    np.testing.assert_allclose(out[0, :, 3, 0], 0.0)  # zeros padding


def test_coords_grid_layout():
    g = np.asarray(coords_grid(3, 5))
    assert g.shape == (3, 5, 2)
    np.testing.assert_allclose(g[0, :, 0], np.arange(5))  # x along width
    np.testing.assert_allclose(g[:, 0, 1], np.arange(3))  # y along height


def _torch_splat_density(coords_xy):
    """Independent torch implementation of bilinear forward splatting."""
    coords = torch.from_numpy(coords_xy)
    n, h, w, _ = coords.shape
    x = coords[..., 0].reshape(n, -1)
    y = coords[..., 1].reshape(n, -1)
    density = torch.zeros(n, h * w, dtype=torch.float64)
    x, y = x.double(), y.double()
    for cx, cy in [
        (torch.floor(x), torch.floor(y)),
        (torch.floor(x), torch.floor(y) + 1),
        (torch.floor(x) + 1, torch.floor(y)),
        (torch.floor(x) + 1, torch.floor(y) + 1),
    ]:
        valid = (cx >= 0) & (cx <= w - 1) & (cy >= 0) & (cy <= h - 1)
        wgt = (1 - (x - cx).abs()) * (1 - (y - cy).abs())
        wgt = torch.where(valid, wgt, torch.zeros_like(wgt))
        idx = (cy.clamp(0, h - 1) * w + cx.clamp(0, w - 1)).long()
        density.scatter_add_(1, idx, wgt)
    return density.reshape(n, h, w).float().numpy()


def test_forward_splat_density():
    coords = RNG.uniform(-2, 12, size=(2, 10, 10, 2)).astype(np.float32)
    got = np.asarray(forward_splat_density(coords))
    want = _torch_splat_density(coords)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_occlusion_masks_shapes_and_range():
    flow = RNG.uniform(-4, 4, size=(2, 12, 12, 2)).astype(np.float32)
    m = np.asarray(occlusion_mask_backward(flow))
    assert m.shape == (2, 12, 12, 1)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    m2 = np.asarray(occlusion_mask_bidirection(flow, -flow))
    assert m2.shape == (2, 12, 12, 1)
    fo, bo = forward_backward_consistency(flow, -flow)
    assert fo.shape == (2, 12, 12)


def test_flow_warp_loss_border_padding():
    img = RNG.standard_normal((1, 6, 6, 3)).astype(np.float32)
    flow = RNG.uniform(-2, 2, size=(1, 6, 6, 2)).astype(np.float32)
    base = np.asarray(coords_grid(6, 6))[None] + flow
    got = np.asarray(flow_warp_loss(img, flow, pad="border"))
    want = _torch_grid_sample(img, base, "border")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bilinear_sample_bf16_table_close():
    """table_dtype=bf16 quantizes only the sampled values (~0.4% rel)."""
    import numpy as np

    import jax.numpy as jnp
    from emip_tpu.ops.warp import flow_warp_loss

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 12, 17, 3)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((2, 12, 17, 2)) * 2.5, jnp.float32)
    exact = flow_warp_loss(x, f)
    quant = flow_warp_loss(x, f, table_dtype=jnp.bfloat16)
    rel = float(jnp.abs(exact - quant).max() / jnp.abs(exact).max())
    assert rel < 0.01, rel
