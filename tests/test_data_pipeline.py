"""Data layer tests on synthetic fixtures: manifest semantics, loaders,
augmentation reproducibility."""

import numpy as np
import pytest

from emip_tpu.data.manifest import scan_clips, scan_pairs
from emip_tpu.data.pipeline import ClipLoader, PairEvalLoader, PairTrainLoader
from emip_tpu.data.synthetic import make_synthetic_video_root


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("moca")
    return make_synthetic_video_root(str(root), num_videos=2,
                                     frames_per_video=5)


def test_pair_manifest_semantics(synth_root):
    pairs = scan_pairs(synth_root, synth_root, "MoCA")
    # 2 videos x (5 frames -> 4 pairs); last GT dropped per video
    assert len(pairs) == 8
    for p in pairs:
        assert p.gt is not None
        # pair (f_i, f_{i+1}) supervised by GT of f_i
        assert p.frame_name in p.gt


def test_clip_manifest(synth_root):
    clips = scan_clips(synth_root, synth_root, "MoCA")
    assert len(clips) == 2
    assert len(clips[0].frames) == 5
    assert len(clips[0].gts) == 5


def test_train_loader_batches(synth_root):
    loader = PairTrainLoader(
        synth_root, synth_root, batch_size=4, size=64, num_workers=2, seed=7
    )
    batches = list(loader)
    assert len(batches) == 2  # 8 pairs / bs 4
    b = batches[0]
    assert b["image1"].shape == (4, 64, 64, 3)
    assert b["image2"].shape == (4, 64, 64, 3)
    assert b["gt"].shape == (4, 64, 64, 1)
    assert 0.0 <= b["gt"].min() and b["gt"].max() <= 1.0
    # ImageNet-normalized images live roughly in [-3, 3]
    assert abs(b["image1"]).max() < 5


def test_train_loader_epoch_reshuffles_but_is_seeded(synth_root):
    l1 = PairTrainLoader(synth_root, synth_root, batch_size=8, size=32,
                         num_workers=2, seed=7, augment=False)
    l2 = PairTrainLoader(synth_root, synth_root, batch_size=8, size=32,
                         num_workers=2, seed=7, augment=False)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["image1"], b2["image1"])  # same seed
    b1e2 = next(iter(l1))  # epoch 2
    assert not np.array_equal(b1["image1"], b1e2["image1"])  # reshuffled


def test_eval_loader_records(synth_root):
    loader = PairEvalLoader(synth_root, synth_root, size=64, with_gt=True)
    recs = list(loader)
    assert len(recs) == 8
    r = recs[0]
    assert r["image1"].shape == (64, 64, 3)
    assert r["gt"].shape == (96, 128)  # native resolution
    assert r["orig_hw"] == (96, 128)
    assert r["video"] == "video_00"


def test_clip_loader(synth_root):
    loader = ClipLoader(synth_root, synth_root, size=64)
    clips = list(loader)
    assert len(clips) == 2
    c = clips[0]
    assert c["frames"].shape == (5, 64, 64, 3)
    assert c["masks"].shape == (5, 64, 64, 1)
    assert len(c["gts"]) == 5


def test_flo_roundtrip(tmp_path):
    from emip_tpu.data.flow_files import read_flo, write_flo

    rng = np.random.default_rng(5)
    flow = rng.standard_normal((12, 17, 2)).astype(np.float32)
    path = str(tmp_path / "x.flo")
    write_flo(path, flow)
    back = read_flo(path)
    np.testing.assert_array_equal(back, flow)


def test_pair_flow_loader(synth_root, tmp_path):
    import os

    from emip_tpu.data.flow_files import PairFlowLoader, write_flo

    # drop a .flo next to the first video's frames
    flow_dir = os.path.join(synth_root, "video_00", "Flow")
    os.makedirs(flow_dir, exist_ok=True)
    write_flo(os.path.join(flow_dir, "00000.flo"),
              np.zeros((96, 128, 2), np.float32))

    loader = PairFlowLoader(synth_root, synth_root, size=64)
    recs = list(loader)
    assert len(recs) == 8
    with_flow = [r for r in recs if "flow" in r]
    assert len(with_flow) == 1
    assert with_flow[0]["flow"].shape == (96, 128, 2)


def test_shard_order_distributed_sampler_semantics():
    from emip_tpu.data.pipeline import shard_order

    order = list(range(10))
    shards = [shard_order(order, i, 3) for i in range(3)]
    # every shard has ceil(10/3) = 4 items
    assert all(len(s) == 4 for s in shards)
    # union covers all items; only the wrap padding (12-10=2) repeats
    flat = [i for s in shards for i in s]
    assert sorted(set(flat)) == order
    assert len(flat) == 12
    # exact DistributedSampler layout: pad by wrapping, then stride
    padded = order + order[:2]
    for i in range(3):
        assert shards[i] == padded[i::3]
    # tiny dataset (wraps more than once) still pads correctly
    tiny = [shard_order([0, 1], i, 5) for i in range(5)]
    assert all(len(s) == 1 for s in tiny)
    assert sorted(i for (i,) in tiny) == [0, 0, 0, 1, 1]
    assert shard_order([], 0, 4) == []


def test_train_loader_sharding(synth_root):
    # two "processes" with the same seed partition each epoch: disjoint
    # pairs, same global shuffle, len() reflects the shard
    kw = dict(batch_size=2, size=32, num_workers=2, seed=7, augment=False)
    full = PairTrainLoader(synth_root, synth_root, **kw)
    s0 = PairTrainLoader(synth_root, synth_root, shard=(0, 2), **kw)
    s1 = PairTrainLoader(synth_root, synth_root, shard=(1, 2), **kw)
    assert len(full) == 4 and len(s0) == len(s1) == 2
    b_full = list(full)
    b0, b1 = list(s0), list(s1)
    assert len(b0) == len(b1) == 2
    # interleaving the two shards' items reproduces the global order
    g = np.concatenate([b["image1"] for b in b_full])
    a = np.concatenate([b["image1"] for b in b0])
    b = np.concatenate([b["image1"] for b in b1])
    np.testing.assert_array_equal(a, g[0::2])
    np.testing.assert_array_equal(b, g[1::2])


def test_clip_loader_sharding(synth_root):
    s0 = ClipLoader(synth_root, synth_root, size=32, shard=(0, 2))
    s1 = ClipLoader(synth_root, synth_root, size=32, shard=(1, 2))
    assert len(s0) == len(s1) == 1
    v0 = [c["video"] for c in s0]
    v1 = [c["video"] for c in s1]
    assert set(v0).isdisjoint(v1) and len(v0) == len(v1) == 1
