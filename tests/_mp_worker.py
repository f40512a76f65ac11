"""Subprocess worker for the 2-process distributed test.

Launched by ``tests/test_multiprocess.py`` as::

    python tests/_mp_worker.py <process_id> <num_processes> <port> <out.npz>

with JAX forced to CPU and 4 virtual local devices per process, so the two
processes together form an 8-device "slice". Initializes the distributed
runtime through :func:`emip_tpu.parallel.mesh.init_distributed` (the code
under test — reference rendezvous: train.py:185-219), runs ONE data-parallel
train step of the tiny short model on a deterministic global batch, and
(process 0) dumps the loss + updated trainable params for the host test to
compare against the single-process result.
"""

import os
import sys

# repo root on sys.path regardless of invocation cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )

    import jax

    jax.config.update("jax_platform_name", "cpu")

    from emip_tpu.parallel import mesh as pmesh

    pmesh.init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import numpy as np

    import jax.numpy as jnp
    from emip_tpu.models.emip_short import EMIPShort
    from emip_tpu.parallel.mesh import make_mesh
    from emip_tpu.train.short import make_short_train_step
    from emip_tpu.train.state import GMFLOW_FREEZE, TrainState, build_optimizer
    from tests.helpers import tiny_short_config

    mesh = make_mesh()
    # the mesh must actually span both processes
    span = {d.process_index for d in mesh.devices.ravel()}
    assert span == set(range(nproc)), span

    cfg = tiny_short_config(inp_size=64)
    model = EMIPShort(config=cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    tx = build_optimizer(learning_rate=1e-3, weight_decay=1e-7, clip_value=0.5)
    state = TrainState.create(variables, tx, GMFLOW_FREEZE)
    step = make_short_train_step(model, tx, donate=False)

    # deterministic global batch; every process materializes the full batch
    # then keeps only its shard_order rows (DistributedSampler equivalent)
    # and feeds them through the production shard_batch multi-host path
    rng = np.random.default_rng(7)
    n = 8
    batch_np = dict(
        image1=rng.standard_normal((n, 64, 64, 3)).astype(np.float32),
        image2=rng.standard_normal((n, 64, 64, 3)).astype(np.float32),
        gt=(rng.uniform(size=(n, 64, 64, 1)) > 0.5).astype(np.float32),
    )
    from emip_tpu.data.pipeline import default_shard, shard_order
    from emip_tpu.parallel.mesh import shard_batch

    assert default_shard() == (pid, nproc)
    rows = shard_order(list(range(n)), pid, nproc)
    with mesh:
        batch = shard_batch({k: v[rows] for k, v in batch_np.items()}, mesh)

    # AOT-compile, then rendezvous at the coordination-service barrier
    # before executing: on a single-core box the two workers can finish
    # compiling minutes apart, and Gloo's collective key-exchange window
    # (~30s) cannot absorb that skew. The KV-store barrier can.
    compiled = step.lower(state, batch, jax.random.PRNGKey(3)).compile()
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier("emip_mp_compiled", 1_800_000)
    new_state, metrics = compiled(state, batch, jax.random.PRNGKey(3))
    loss = float(metrics["loss"])

    if pid == 0:
        from flax import traverse_util

        flat = {
            "/".join(k): np.asarray(v)
            for k, v in traverse_util.flatten_dict(new_state.params).items()
        }
        np.savez(out_path, loss=np.float64(loss), **flat)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
