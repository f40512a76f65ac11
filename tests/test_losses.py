"""Golden tests for losses vs independent torch implementations."""

import numpy as np
import torch
import torch.nn.functional as F

from emip_tpu.losses.flow import UnsupFlowLossConfig, ssim_distance, unsup_flow_loss
from emip_tpu.losses.seg import hybrid_e_loss

RNG = np.random.default_rng(2)


def _torch_hybrid_e_loss(pred_nhwc, mask_nhwc):
    pred = torch.from_numpy(pred_nhwc).permute(0, 3, 1, 2)
    mask = torch.from_numpy(mask_nhwc).permute(0, 3, 1, 2)
    wbce = F.binary_cross_entropy_with_logits(pred, mask, reduction="mean")
    p = torch.sigmoid(pred)
    mp = p.mean(dim=(2, 3), keepdim=True)
    mm = mask.mean(dim=(2, 3), keepdim=True)
    phi_fm, phi_gt = p - mp, mask - mm
    efm = (2 * phi_fm * phi_gt + 1e-8) / (phi_fm**2 + phi_gt**2 + 1e-8)
    qfm = (1 + efm) ** 2 / 4
    eloss = 1 - qfm.mean(dim=(2, 3))
    inter = (p * mask).sum(dim=(2, 3))
    union = (p + mask).sum(dim=(2, 3))
    wiou = 1 - (inter + 1 + 1e-8) / (union - inter + 1 + 1e-8)
    return (wbce + eloss + wiou).mean().item()


def test_hybrid_e_loss_matches_torch():
    pred = RNG.standard_normal((3, 16, 16, 1)).astype(np.float32)
    mask = (RNG.uniform(size=(3, 16, 16, 1)) > 0.5).astype(np.float32)
    got = float(hybrid_e_loss(pred, mask))
    want = _torch_hybrid_e_loss(pred, mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _torch_ssim(x_nhwc, y_nhwc, radius=1):
    x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    y = torch.from_numpy(y_nhwc).permute(0, 3, 1, 2)
    patch = 2 * radius + 1
    c1, c2 = 0.01**2, 0.03**2
    pool = torch.nn.AvgPool2d(patch, 1, 0)
    mu_x, mu_y = pool(x), pool(y)
    sx = pool(x * x) - mu_x**2
    sy = pool(y * y) - mu_y**2
    sxy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    d = (mu_x**2 + mu_y**2 + c1) * (sx + sy + c2)
    return torch.clamp((1 - n / d) / 2, 0, 1).permute(0, 2, 3, 1).numpy()


def test_ssim_matches_torch():
    x = RNG.uniform(size=(2, 12, 12, 3)).astype(np.float32)
    y = RNG.uniform(size=(2, 12, 12, 3)).astype(np.float32)
    got = np.asarray(ssim_distance(x, y, radius=1))
    want = _torch_ssim(x, y, radius=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_unsup_flow_loss_finite_and_zero_flow_small():
    im1 = RNG.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    # im2 = im1 shifted content: zero flow on identical images gives ~0 warp L1
    flow = np.zeros((2, 32, 32, 2), dtype=np.float32)
    total, warp, mean_abs = unsup_flow_loss(
        [(flow, flow), (flow, flow)], im1, im1, UnsupFlowLossConfig()
    )
    assert np.isfinite(float(total))
    assert float(mean_abs) == 0.0
    # identical images, zero flow: only SSIM boundary effects remain ~ 0
    assert float(warp) < 1e-4


def test_unsup_flow_loss_penalizes_wrong_flow():
    im1 = RNG.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    im2 = np.roll(im1, shift=3, axis=2)
    zero = np.zeros((1, 32, 32, 2), dtype=np.float32)
    # correct flow: sample im2 at x+3 to reconstruct im1? im2[x] = im1[x-3],
    # so im1[x] = im2[x+3] -> fw flow = +3 in x.
    good = zero.copy()
    good[..., 0] = 3.0
    bad = zero.copy()
    bad[..., 0] = -5.0
    l_good, _, _ = unsup_flow_loss([(good, -good)], im1, im2)
    l_bad, _, _ = unsup_flow_loss([(bad, -bad)], im1, im2)
    assert float(l_good) < float(l_bad)
