"""Golden tests: resize ops vs torch.nn.functional.interpolate."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from emip_tpu.ops.image import resize_area, resize_bilinear, resize_nearest

RNG = np.random.default_rng(0)


def _rand(n, h, w, c):
    return RNG.standard_normal((n, h, w, c)).astype(np.float32)


def _torch_resize(x_nhwc, out_hw, mode, align_corners=None):
    t = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    kwargs = {} if align_corners is None else {"align_corners": align_corners}
    out = F.interpolate(t, size=out_hw, mode=mode, **kwargs)
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("shape,out_hw", [
    ((2, 11, 11, 3), (22, 22)),
    ((1, 44, 44, 2), (352, 352)),
    ((2, 7, 13, 4), (20, 9)),
    ((1, 5, 5, 1), (5, 5)),
])
@pytest.mark.parametrize("align", [True, False])
def test_resize_bilinear(shape, out_hw, align):
    x = _rand(*shape)
    got = np.asarray(resize_bilinear(x, out_hw, align_corners=align))
    want = _torch_resize(x, out_hw, "bilinear", align)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,out_hw", [
    ((2, 352, 352, 3), (44, 44)),
    ((1, 20, 30, 2), (7, 11)),
    ((1, 8, 8, 1), (8, 8)),
])
def test_resize_area(shape, out_hw):
    x = _rand(*shape)
    got = np.asarray(resize_area(x, out_hw))
    want = _torch_resize(x, out_hw, "area")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape,out_hw", [
    ((2, 44, 44, 1), (22, 22)),
    ((1, 10, 10, 2), (23, 17)),
])
def test_resize_nearest(shape, out_hw):
    x = _rand(*shape)
    got = np.asarray(resize_nearest(x, out_hw))
    want = _torch_resize(x, out_hw, "nearest")
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
