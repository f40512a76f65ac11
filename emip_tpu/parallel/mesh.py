"""Device mesh and sharding helpers: SPMD data parallelism over ICI.

The reference scales with DDP/NCCL + DistributedSampler (SURVEY.md §2.3,
reference train.py:185-219,279). The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis: batches are sharded along
``data``, parameters are replicated, and XLA inserts the psum gradient
all-reduce over ICI inside the jitted train step — no hand-written
collectives. A ``model`` axis is factored in (size 1 by default) so tensor
parallelism can slot in without API changes.

Multi-host (DCN) runs initialize with ``jax.distributed.initialize`` and use
the same mesh spanning all hosts — that call replaces the reference's
SLURM/torchrun rendezvous.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "fetch_global",
    "is_primary",
    "init_distributed",
]


def make_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """('data', 'model') mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis along 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, sp: bool = False,
                process_local: bool = True):
    """Device-put a pytree of host arrays, batch-sharded along 'data'.

    With ``sp`` (sequence parallelism) the spatial H dim additionally
    shards along 'model' (emip_tpu/parallel/sharding.py).

    Single-process: a plain ``device_put`` onto the batch sharding.
    Multi-process (mesh spanning hosts), the meaning of the host rows is
    declared by ``process_local``:

    * ``process_local=True`` (train loaders): each process holds only its
      OWN rows — the shard its data loader produced
      (``data.pipeline.shard_order``, the DistributedSampler equivalent) —
      so the global array is assembled with
      ``jax.make_array_from_process_local_data``; the global batch is
      ``process_count`` times the local one.
    * ``process_local=False`` (eval/infer callers feeding the FULL batch
      identically from every process): the global shape equals the local
      one, and each process contributes its addressable slices from its
      full copy via ``jax.make_array_from_callback``. Without this flag
      such callers would get an nproc-times-duplicated global batch (and a
      recompile at the wrong shape).
    """
    if sp:
        from emip_tpu.parallel.sharding import batch_partition_spec

        model_size = mesh.shape.get("model", 1)
        per_leaf = lambda x: NamedSharding(  # noqa: E731
            mesh, batch_partition_spec(x, model_size=model_size, sp=True)
        )
    else:
        sharding = batch_sharding(mesh)
        per_leaf = lambda x: sharding  # noqa: E731
    if jax.process_count() > 1:
        if process_local:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    per_leaf(x), np.asarray(x)
                ),
                batch,
            )

        def from_full_copy(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, per_leaf(x), lambda idx: x[idx]
            )

        return jax.tree_util.tree_map(from_full_copy, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, per_leaf(x)), batch
    )


def fetch_global(x) -> np.ndarray:
    """Full global value of a (possibly cross-process) jax.Array as numpy.

    Single-process (or fully-addressable / fully-replicated) arrays are a
    plain ``np.asarray``. A batch-sharded array in a multi-process run is
    not fully addressable — ``np.asarray`` raises — so it is allgathered
    across processes first. Eval/metric paths use this to read back logits
    regardless of the run topology.
    """
    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True) \
            or getattr(x, "is_fully_replicated", False):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def is_primary() -> bool:
    """True on the process that should own host-side file writes.

    Scalar logs and text logs are written by process 0 only (every process
    computes identical metrics since eval inputs/outputs are replicated —
    see ``shard_batch(process_local=False)``/``fetch_global``). Orbax
    checkpoint saves are NOT guarded by this: ``CheckpointManager.save`` is
    a collective in multi-process runs (orbax coordinates single-writer
    semantics internally), so every process must call it.
    """
    return jax.process_index() == 0


def _distributed_env(environ=None) -> bool:
    """True when env vars indicate a multi-process launch (no backend touch)."""
    import os

    env = os.environ if environ is None else environ
    if env.get("JAX_COORDINATOR_ADDRESS") or env.get("COORDINATOR_ADDRESS"):
        return True
    if int(env.get("SLURM_NTASKS") or 1) > 1:
        return True
    if int(env.get("WORLD_SIZE") or 1) > 1:  # torchrun-style rendezvous
        return True
    return False


_initialized = False


def init_distributed(**kwargs) -> None:
    """Multi-host bootstrap (DCN). No-op in single-process runs.

    TPU-native replacement for the reference's SLURM/torchrun + NCCL
    rendezvous (train.py:185-219). The multi-process environment is
    detected from env vars or explicit kwargs BEFORE any backend access:
    probing the backend first (e.g. via ``jax.process_count()``) would
    initialize it locally, after which ``jax.distributed.initialize`` is
    forbidden — exactly the silent-degrade-to-N-independent-runs failure
    mode this function must not have. Misconfiguration therefore raises.
    """
    global _initialized
    if _initialized:
        return

    import os

    env = os.environ
    if not kwargs:
        if not _distributed_env():
            return  # plain single-process run
        if (
            int(env.get("WORLD_SIZE") or 1) > 1
            and not env.get("JAX_COORDINATOR_ADDRESS")
            and not env.get("COORDINATOR_ADDRESS")
            and int(env.get("SLURM_NTASKS") or 1) <= 1
        ):
            # torchrun-style env (reference train.py:209-210): map it onto
            # the JAX rendezvous explicitly; initialize() only auto-detects
            # SLURM / cloud-TPU metadata.
            kwargs = dict(
                coordinator_address="{}:{}".format(
                    env.get("MASTER_ADDR", "localhost"),
                    env.get("MASTER_PORT", "12355"),
                ),
                num_processes=int(env["WORLD_SIZE"]),
                process_id=int(env.get("RANK", "0")),
            )
    jax.distributed.initialize(**kwargs)  # raises on misconfiguration
    _initialized = True
