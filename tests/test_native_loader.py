"""Native C++ loader: build, decode parity vs PIL, and batch throughput."""

import numpy as np
import pytest
from PIL import Image

from emip_tpu.data import native
from emip_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader did not build"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (90, 120, 3), np.uint8)
    jpg = str(root / "a.jpg")
    png = str(root / "b.png")
    gray_png = str(root / "g.png")
    Image.fromarray(arr).save(jpg, quality=95)
    Image.fromarray(arr).save(png)
    Image.fromarray(arr[..., 0]).save(gray_png)
    return jpg, png, gray_png


def _pil_reference(path, size, gray):
    with Image.open(path) as im:
        im = im.convert("L" if gray else "RGB")
        im = im.resize((size, size), Image.BILINEAR)
        arr = np.asarray(im, np.float32) / 255.0
    if gray:
        return arr[..., None]
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return (arr - mean) / std


@pytest.mark.parametrize("which,gray", [(1, False), (0, False), (2, True)])
def test_native_matches_pil(images, which, gray):
    path = images[which]
    got = native.load_image(path, 64, gray=gray)
    want = _pil_reference(path, 64, gray)
    # PIL resamples with int16 fixed-point coefficients and rounds to uint8
    # per-pass; the native float path differs by ~1/255 per pixel.
    scale = 1.0 if gray else 1.0 / min(IMAGENET_STD)
    np.testing.assert_allclose(got, want, atol=2.5 / 255 * scale)


def test_native_batch(images):
    jpg, png, _ = images
    batch = native.load_batch([jpg, png, jpg, png], 64, num_threads=4)
    assert batch.shape == (4, 64, 64, 3)
    np.testing.assert_array_equal(batch[0], batch[2])
    single = native.load_image(jpg, 64)
    np.testing.assert_array_equal(batch[0], single)


def test_native_image_size(images):
    h, w = native.image_size(images[0])
    assert (h, w) == (90, 120)


def test_native_missing_file_fails_cleanly():
    with pytest.raises(IOError):
        native.load_image("/nonexistent/file.jpg", 32)


def test_eval_loader_native_path(tmp_path):
    from emip_tpu.data.pipeline import PairEvalLoader
    from emip_tpu.data.synthetic import make_synthetic_video_root

    root = make_synthetic_video_root(str(tmp_path / "d"), num_videos=1,
                                     frames_per_video=3, size=(60, 80))
    pil = list(PairEvalLoader(root, None, size=48, with_gt=False,
                              use_native=False))
    nat = list(PairEvalLoader(root, None, size=48, with_gt=False,
                              use_native=True))
    assert len(pil) == len(nat) == 2
    assert nat[0]["orig_hw"] == pil[0]["orig_hw"] == (60, 80)
    scale = 1.0 / min(IMAGENET_STD)
    np.testing.assert_allclose(nat[0]["image1"], pil[0]["image1"],
                               atol=2.5 / 255 * scale)
