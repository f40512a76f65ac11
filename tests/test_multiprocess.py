"""Multi-process distributed tests: the mesh spans processes, and a
2-process data-parallel train step matches the single-process result.

The reference's multi-node path is DDP/NCCL with SLURM/torchrun rendezvous
(train.py:185-219); ours is ``jax.distributed.initialize`` + one global mesh
(parallel/mesh.py). Two subprocesses with 4 virtual CPU devices each form an
8-device "slice"; both run one DP step of the tiny short model on the same
deterministic global batch through ``tests/_mp_worker.py``, and process 0's
updated params are compared against an in-process single-device step.
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emip_tpu.parallel.mesh import _distributed_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def test_distributed_env_detection():
    assert not _distributed_env({})
    assert not _distributed_env({"SLURM_NTASKS": "1", "WORLD_SIZE": "1"})
    assert _distributed_env({"SLURM_NTASKS": "4"})
    assert _distributed_env({"WORLD_SIZE": "2"})
    assert _distributed_env({"JAX_COORDINATOR_ADDRESS": "h:1234"})
    assert _distributed_env({"COORDINATOR_ADDRESS": "h:1234"})


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_step():
    """One unsharded train step on the identical batch (the baseline)."""
    from emip_tpu.models.emip_short import EMIPShort
    from emip_tpu.train.short import make_short_train_step
    from emip_tpu.train.state import (
        GMFLOW_FREEZE,
        TrainState,
        build_optimizer,
    )
    from tests.helpers import tiny_short_config

    cfg = tiny_short_config(inp_size=64)
    model = EMIPShort(config=cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    tx = build_optimizer(learning_rate=1e-3, weight_decay=1e-7, clip_value=0.5)
    state = TrainState.create(variables, tx, GMFLOW_FREEZE)
    step = make_short_train_step(model, tx, donate=False)

    rng = np.random.default_rng(7)
    n = 8
    batch = dict(
        image1=rng.standard_normal((n, 64, 64, 3)).astype(np.float32),
        image2=rng.standard_normal((n, 64, 64, 3)).astype(np.float32),
        gt=(rng.uniform(size=(n, 64, 64, 1)) > 0.5).astype(np.float32),
    )
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    from flax import traverse_util

    flat = {
        "/".join(k): np.asarray(v)
        for k, v in traverse_util.flatten_dict(new_state.params).items()
    }
    return float(metrics["loss"]), flat


@pytest.mark.slow
def test_two_process_dp_step_matches_single(tmp_path):
    port = _free_port()
    out = str(tmp_path / "p0.npz")

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), out],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    # this box can be a single core: two workers compile the step serially
    logs = [p.communicate(timeout=2400)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    got = np.load(out)
    want_loss, want_params = _single_process_step()

    # rtol rationale: the cross-process program is compiled with a
    # different device assignment than the in-process one, and f32
    # reduction-order noise (~1e-7) in the flows gets amplified through
    # the unsup flow loss's piecewise-constant warp indexing (floor())
    # to ~1e-4 of loss — the same discontinuity documented for grad
    # parity (CLAUDE.md round 3). The strong DP-correctness claim is the
    # per-parameter check below; rtol=1e-5 here held only while the two
    # programs happened to compile identically (it broke when the
    # flash-matching kernel changed compilation, round 5).
    np.testing.assert_allclose(float(got["loss"]), want_loss, rtol=5e-4)
    keys = [k for k in got.files if k != "loss"]
    assert set(keys) == set(want_params)
    # same tolerance rationale as test_train_step_ddp_equivalence: Adam can
    # flip a near-zero gradient element's update sign on reduction-order
    # noise, bounding each element by ~2.5x the learning rate
    for k in keys:
        np.testing.assert_allclose(
            got[k], want_params[k], rtol=0, atol=2.5e-3, err_msg=k
        )
