"""Config loader tests: shipped YAML parses into typed configs."""

import dataclasses

import pytest

from emip_tpu.utils.config import load_config


def test_shipped_config_parses():
    cfg = load_config("configs/emip.yaml")
    assert cfg.model.backbone_name == "pvt_v2_b5"
    assert cfg.model.inp_size == 352
    assert cfg.model.gmflow.feature_channels == 128
    assert cfg.model.gmflow.attn_splits_list == (2,)
    assert cfg.model.gmflow.pred_bidir_flow is True
    assert cfg.optimizer.lr == pytest.approx(1e-5)
    assert cfg.epoch_max == 30
    assert cfg.clip == 0.5
    assert cfg.val_dataset_cad is not None  # block the reference forgot
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.parallel.model_parallel == 1  # DDP regime by default
    assert cfg.parallel.fsdp is False


def test_reference_style_config_parses(tmp_path):
    """The reference's key layout (model.args with in_channel_list etc.)
    must load without modification."""
    yaml_text = """
train_dataset:
  image_path: /data/train/
  gt_path: /data/train/
  inp_size: 352
  batch_size: 6
  dataset_type: MoCA
val_dataset:
  image_path: /data/val/
  gt_path: /data/val/
  inp_size: 352
  batch_size: 1
  dataset_type: MoCA
load:
  path: /weights/Net_epoch_1_4.pth
  flow_path: /weights/gmflow_things-e9887eda.pth
  long_path: /weights/Net_long_best.pth
  type: COD10K
model:
  name: EMIP
  args:
    inp_size: 352
    iters: 2
    corr_levels: 4
    corr_radius: 4
    test_mode: False
    channel: 32
    backbone_name: pvt_v2_b5
    in_channel_list: [128, 320, 512]
    hidden_dim: 128
    context_dim: 128
    GMFlow:
      padding_factor: 16
      upsample_factor: 8
      attn_splits_list: [2]
      corr_radius_list: [-1]
      prop_radius_list: [-1]
      num_scales: 1
      num_head: 1
      attention_type: 'swin'
      ffn_dim_expansion: 4
      num_transformer_layers: 6
      feature_channels: 128
      pred_bidir_flow: True
optimizer:
  name: adamw
  lr: 1.0e-05
  weight_decay: 1.0e-07
lr_min: 1.0e-06
epoch_max: 30
clip: 0.5
seed: 123
epoch: 100
save_path: ./snapshots/
epoch_val: 1
epoch_save: 1
"""
    p = tmp_path / "ref_style.yaml"
    p.write_text(yaml_text)
    cfg = load_config(str(p))
    assert cfg.model.backbone_name == "pvt_v2_b5"
    assert cfg.model.gmflow.num_transformer_layers == 6
    assert cfg.load.flow_path.endswith("gmflow_things-e9887eda.pth")
    assert cfg.load.long_path.endswith("Net_long_best.pth")
    assert cfg.seed == 123
    assert cfg.epoch == 100
    # reference-style YAML has no parallel block -> DDP defaults
    assert cfg.parallel.model_parallel == 1
    assert cfg.parallel.fsdp is False


def test_parallel_block_parses(tmp_path):
    p = tmp_path / "tp.yaml"
    p.write_text(
        "model:\n  args:\n    inp_size: 64\n"
        "parallel:\n  model_parallel: 4\n  fsdp: true\n"
    )
    cfg = load_config(str(p))
    assert cfg.parallel.model_parallel == 4
    assert cfg.parallel.fsdp is True


def test_invalid_inp_size_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("model:\n  args:\n    inp_size: 100\n")
    with pytest.raises(ValueError, match="divisible by 32"):
        load_config(str(p))
