"""Long-model streaming inference + long training loop smoke tests."""

import glob
import os

import numpy as np
import pytest

from emip_tpu.data.synthetic import make_synthetic_video_root


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_long")
    return make_synthetic_video_root(str(root), num_videos=1,
                                     frames_per_video=4, size=(72, 96))


def test_predict_clips_long(synth, tmp_path):
    import jax
    import jax.numpy as jnp

    from emip_tpu.infer import predict_clips_long
    from emip_tpu.models.emip_long import EMIPLong
    from tests.helpers import tiny_short_config

    cfg = tiny_short_config(inp_size=64)
    model = EMIPLong(config=cfg, memory_size=3)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img,
                           model.init_memory(1), False)

    out = str(tmp_path / "preds_long")
    predict_clips_long(model, variables, synth, out, size=64,
                       dataset_type="MoCA")
    pngs = sorted(glob.glob(os.path.join(out, "video_00", "*.png")))
    assert len(pngs) == 4  # every frame gets a mask (frame 0 via short path)
    from PIL import Image

    with Image.open(pngs[0]) as im:
        assert im.size == (96, 72)
