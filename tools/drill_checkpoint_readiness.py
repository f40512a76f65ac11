#!/usr/bin/env python
"""Accuracy-readiness drill: prove the published-checkpoint pipeline works.

Creates reference-format torch snapshots with random weights — a full EMIP
``CoUpdater`` state dict (with the DDP ``module.`` prefixes the published
checkpoints carry, train.py:284) and an upstream-format ``gmflow_things``
checkpoint — then drives the real CLI chain on synthetic data at the full
352^2 / PVTv2-B5 configuration:

    config(load.path=..., load.flow_path=...) -> test.py -> eval_offline.py

Everything downstream of "real MoCA-Mask/CAD data + published .pth" is
exercised; the moment those assets exist, the same commands produce the
BASELINE.md comparison. Run on CPU (JAX_PLATFORM_NAME=cpu) or TPU.

Usage: python tools/drill_checkpoint_readiness.py [workdir]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ckpt_drill"


def make_reference_snapshots():
    import torch

    from tests.ref_oracle import import_reference, reference_model_args

    model_mod = import_reference("model.EMIP_short.model")
    import_reference("lib.pvt_v2")  # pre-cache: CoUpdater lazily imports it
    torch.manual_seed(0)
    print(">>> constructing reference CoUpdater (full b5)...", flush=True)
    co = model_mod.CoUpdater(reference_model_args())
    sd = {f"module.{k}": v for k, v in co.state_dict().items()}
    path = os.path.join(WORK, "Net_epoch_best.pth")
    torch.save(sd, path)
    print(f">>> wrote {path} ({len(sd)} keys)")

    gm_sd = {k[len("GMFlow."):]: v for k, v in co.state_dict().items()
             if k.startswith("GMFlow.")}
    gm_path = os.path.join(WORK, "gmflow_things.pth")
    torch.save({"model": gm_sd}, gm_path)
    print(f">>> wrote {gm_path} ({len(gm_sd)} keys)")
    return path, gm_path


def main():
    os.makedirs(WORK, exist_ok=True)

    from emip_tpu.data.synthetic import make_synthetic_video_root

    data_root = os.path.join(WORK, "MoCA_test")
    if not os.path.isdir(data_root):
        make_synthetic_video_root(data_root, num_videos=1,
                                  frames_per_video=4, size=(96, 128))

    snap, gm = make_reference_snapshots()

    cfg_path = os.path.join(WORK, "full.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""
val_dataset:
  image_path: {data_root}/
  gt_path: {data_root}/
  type: test
  inp_size: 352
  batch_size: 1
  dataset_type: MoCA
load:
  path: {snap}
  flow_path: {gm}
  type: EMIP
model:
  name: EMIP
  args:
    inp_size: 352
    channel: 32
    backbone_name: pvt_v2_b5
    in_channel_list: [128, 320, 512]
    include_dead_modules: true
    GMFlow:
      feature_channels: 128
      num_transformer_layers: 6
      attn_splits_list: [2]
      corr_radius_list: [-1]
      prop_radius_list: [-1]
      pred_bidir_flow: true
save_path: {WORK}/run/
compute_dtype: float32
""")

    env = dict(os.environ)
    preds = os.path.join(WORK, "preds")
    subprocess.run(
        [sys.executable, "test.py", "--config", cfg_path,
         "--data", f"MoCA_test={data_root}/", "--save_path", preds,
         "--batch_size", "1"],
        check=True, env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    )
    subprocess.run(
        [sys.executable, "eval_offline.py", "--gt_root", WORK,
         "--pred_root", preds, "--data", "MoCA_test",
         "--out", os.path.join(WORK, "evalres")],
        check=True, env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    )
    print(">>> DRILL OK: converted reference-format .pth -> predictions -> "
          "metric table")


if __name__ == "__main__":
    main()
