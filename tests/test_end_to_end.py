"""End-to-end smoke tests on synthetic data: short training improves loss,
prediction dumping produces valid PNGs, and the offline evaluator scores
them under the canonical protocol."""

import glob
import os

import jax
import numpy as np
import pytest
from PIL import Image

from emip_tpu.data.synthetic import make_synthetic_video_root
from emip_tpu.eval_offline import evaluate_dataset
from emip_tpu.infer import predict_pairs
from emip_tpu.models.emip_short import EMIPShort
from emip_tpu.train.short import make_short_train_step
from emip_tpu.train.state import GMFLOW_FREEZE, TrainState, build_optimizer
from tests.helpers import tiny_short_config

SIZE = 64


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return make_synthetic_video_root(str(root), num_videos=2,
                                     frames_per_video=6, size=(72, 96))


@pytest.fixture(scope="module")
def trained(synth):
    import jax.numpy as jnp

    from emip_tpu.data.pipeline import PairTrainLoader

    cfg = tiny_short_config(inp_size=SIZE)
    model = EMIPShort(config=cfg)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    tx = build_optimizer(learning_rate=3e-4)
    state = TrainState.create(variables, tx, GMFLOW_FREEZE)
    step = make_short_train_step(model, tx, donate=False)

    loader = PairTrainLoader(synth, synth, batch_size=4, size=SIZE,
                             num_workers=2, seed=1)
    losses = []
    rng = jax.random.PRNGKey(0)
    for epoch in range(4):
        for batch in loader:
            rng, srng = jax.random.split(rng)
            state, metrics = step(state, batch, srng)
            losses.append(float(metrics["loss_pred"]))
    return model, state, losses


def test_training_reduces_seg_loss(trained):
    _, _, losses = trained
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_predict_dump_and_offline_eval(trained, synth, tmp_path):
    model, state, _ = trained
    pred_root = str(tmp_path / "preds")
    predict_pairs(model, state, synth, pred_root, size=SIZE,
                  dataset_type="MoCA", batch_size=4)

    pngs = glob.glob(os.path.join(pred_root, "*", "*.png"))
    # 2 videos x 5 pairs
    assert len(pngs) == 10
    with Image.open(pngs[0]) as im:
        assert im.mode == "L"
        assert im.size == (96, 72)  # native resolution

    scores = evaluate_dataset(
        gt_root=synth, pred_root=pred_root, dataset_name="MoCA_test",
        verbose=False,
    )
    # MoCA protocol drops the last 2 GT frames -> 4 scored frames per video
    for key in ("Smeasure", "wFmeasure", "MAE", "meanEm", "meanDice",
                "meanIoU"):
        assert key in scores
        assert np.isfinite(scores[key])
    assert 0 <= scores["MAE"] <= 1
    assert 0 <= scores["Smeasure"] <= 1


def test_sharded_validation_matches_single_device(trained, synth):
    """validate_short over the 8-device mesh == single-device results
    (the DistributedSampler-equivalent claim for evaluation)."""
    from types import SimpleNamespace

    from emip_tpu.parallel.mesh import make_mesh
    from emip_tpu.train.loops import validate_short

    model, state, _ = trained
    cfg = SimpleNamespace(val_dataset=SimpleNamespace(
        image_path=synth, gt_path=synth, inp_size=SIZE, dataset_type="MoCA",
    ))

    single = validate_short(model, state, cfg, max_items=6)
    sharded = validate_short(model, state, cfg, max_items=6,
                             mesh=make_mesh())
    for k in single:
        np.testing.assert_allclose(sharded[k], single[k], rtol=1e-4,
                                   atol=1e-6, err_msg=k)
