"""Tests for window partitioning, shifted-window masks, position embedding,
and convex upsampling (golden vs torch where behavior is subtle)."""

import numpy as np
import torch
import torch.nn.functional as F

from emip_tpu.ops.position import sine_position_embedding
from emip_tpu.ops.upsample import convex_upsample, upsample_flow_bilinear
from emip_tpu.ops.window import shifted_window_mask, window_merge, window_split

RNG = np.random.default_rng(3)


def test_window_split_merge_roundtrip():
    x = RNG.standard_normal((2, 8, 8, 5)).astype(np.float32)
    for k in (1, 2, 4):
        y = window_split(x, k)
        assert y.shape == (2 * k * k, 8 // k, 8 // k, 5)
        back = window_merge(y, k)
        np.testing.assert_array_equal(np.asarray(back), x)


def test_window_split_ordering():
    # windows must be ordered row-major over the KxK grid per batch element
    x = np.zeros((1, 4, 4, 1), dtype=np.float32)
    x[0, :2, :2] = 0  # TL
    x[0, :2, 2:] = 1  # TR
    x[0, 2:, :2] = 2  # BL
    x[0, 2:, 2:] = 3  # BR
    y = np.asarray(window_split(x, 2))
    for i in range(4):
        assert np.all(y[i] == i)


def _torch_shift_mask(h, w, k):
    """Reference-style mask built independently with torch."""
    win_h, win_w = h // k, w // k
    sh, sw = win_h // 2, win_w // 2
    img = torch.zeros(1, h, w, 1)
    cnt = 0
    for hs in (slice(0, -win_h), slice(-win_h, -sh), slice(-sh, None)):
        for ws in (slice(0, -win_w), slice(-win_w, -sw), slice(-sw, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    m = img.view(1, k, win_h, k, win_w, 1).permute(0, 1, 3, 2, 4, 5)
    m = m.reshape(k * k, win_h * win_w)
    attn = m.unsqueeze(1) - m.unsqueeze(2)
    attn = attn.masked_fill(attn != 0, -100.0).masked_fill(attn == 0, 0.0)
    return attn.numpy()


def test_shifted_window_mask_matches_reference_rule():
    for (h, w, k) in [(44, 44, 2), (8, 8, 2), (16, 16, 4)]:
        got = np.asarray(shifted_window_mask(h, w, k))
        want = _torch_shift_mask(h, w, k)
        np.testing.assert_array_equal(got, want)


def _torch_sine_pos(h, w, c, temperature=10000.0):
    num_pos_feats = c // 2
    mask = torch.ones((1, h, w))
    y_embed = mask.cumsum(1, dtype=torch.float32)
    x_embed = mask.cumsum(2, dtype=torch.float32)
    eps, scale = 1e-6, 2 * np.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=4).flatten(3)
    pos = torch.cat((pos_y, pos_x), dim=3)
    return pos[0].numpy()


def test_sine_position_embedding_matches_torch():
    got = np.asarray(sine_position_embedding(22, 22, 128))
    want = _torch_sine_pos(22, 22, 128)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _torch_convex_upsample(flow_nhwc, mask_nhwc, factor=8):
    flow = torch.from_numpy(flow_nhwc).permute(0, 3, 1, 2)
    mask = torch.from_numpy(mask_nhwc).permute(0, 3, 1, 2)
    b, ch, h, w = flow.shape
    mask = mask.view(b, 1, 9, factor, factor, h, w)
    mask = torch.softmax(mask, dim=2)
    up = F.unfold(factor * flow, [3, 3], padding=1)
    up = up.view(b, ch, 9, 1, 1, h, w)
    up = torch.sum(mask * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3)
    up = up.reshape(b, ch, factor * h, factor * w)
    return up.permute(0, 2, 3, 1).numpy()


def test_convex_upsample_matches_torch():
    flow = RNG.standard_normal((2, 6, 6, 2)).astype(np.float32)
    mask = RNG.standard_normal((2, 6, 6, 9 * 64)).astype(np.float32)
    got = np.asarray(convex_upsample(flow, mask, factor=8))
    want = _torch_convex_upsample(flow, mask, factor=8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_upsample_flow_bilinear_matches_torch():
    flow = RNG.standard_normal((1, 5, 5, 2)).astype(np.float32)
    got = np.asarray(upsample_flow_bilinear(flow, 4))
    t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    want = (
        F.interpolate(t, scale_factor=4, mode="bilinear", align_corners=True) * 4
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
