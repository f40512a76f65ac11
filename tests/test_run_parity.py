"""The one-command parity runbook runs end to end with synthetic assets.

``run_parity.sh --drill`` = reference-format .pth (random weights, DDP
prefixes) -> converter -> test.py prediction dump -> offline evaluator ->
parity_report.json. This is the exact command that produces the BASELINE.md
comparison once real MoCA-Mask/CAD data + published checkpoints exist.
"""

import json
import os
import subprocess
import sys

import pytest

from tests.ref_oracle import has_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_run_parity_drill(tmp_path):
    out = str(tmp_path / "parity")
    # FORCE cpu (don't setdefault: the harness shell exports
    # JAX_PLATFORMS=axon, and a subprocess inheriting it would try the
    # single-client TPU tunnel)
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "run_parity.sh"), "--drill",
         "--out", out],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "DRILL OK" in proc.stdout

    with open(os.path.join(out, "parity_report.json")) as f:
        report = json.load(f)
    scores = report["short"]["MoCA_test"]
    # every BASELINE.md metric is present and was measured
    for m in ("Smeasure", "wFmeasure", "MAE", "meanDice", "meanIoU"):
        assert "measured" in scores[m], m
        assert "published" in scores[m] and "delta" in scores[m], m
