"""Tensor-parallel / FSDP parameter sharding over the ('data','model') mesh.

The reference scales only via DDP (reference train.py:185-219): every GPU
holds the full model. On TPU the idiomatic generalization is GSPMD: assign
each parameter leaf a ``PartitionSpec`` over the mesh and let XLA partition
every matmul/conv and insert the collectives (all-gather / reduce-scatter
over ICI). Nothing in the model code changes — sharding is a property of
the data, applied here to the whole ``TrainState`` pytree:

- **Tensor parallelism** (``tp``, 'model' axis): attention/FFN weight
  matrices are sharded head-/hidden-wise. Up-projections (q/kv/fc1/mlp0/
  patch-embed/...) shard the *output* features; down-projections
  (proj/fc2/mlp2/merge) shard the *input* features so the pattern matches
  Megatron-style column->row parallel pairs and the activation stays
  replicated at block boundaries.
- **FSDP** (``fsdp``, 'data' axis): every large leaf (params, Adam mu/nu)
  is additionally sharded along 'data' on its largest free dimension —
  ZeRO-3-style memory scaling; XLA gathers weights on use and
  reduce-scatters gradients.

Rules are name-aware but *safety is not name-dependent*: a spec only ever
selects dimensions divisible by the mesh axis (anything else replicates),
and GSPMD semantics are sharding-independent — a suboptimal spec costs
communication, never correctness (tests/test_tensor_parallel.py asserts
numeric equivalence with the single-device step).

Optimizer state shards with its parameters: Adam's mu/nu pytrees mirror the
param tree, so the same path rules fire (their ``jax.tree_util.keystr``
paths contain the param path).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "leaf_partition_spec",
    "batch_partition_spec",
    "state_shardings",
    "shard_pytree",
    "sharded_state_and_batch",
]

# Module names whose kernels shard the INPUT-feature dim on 'model'
# (Megatron "row-parallel": the preceding op sharded its outputs).
_ROW_PARALLEL = ("proj", "fc2", "mlp2", "merge", "reduction")
# Everything else kernel-like shards the OUTPUT-feature dim
# ("column-parallel"): q, kv, fc1, mlp0, q_proj, k_proj, v_proj, sr,
# patch_embed convs, decoder convs, ...


def _dim_divisible(shape, dim: int, size: int) -> bool:
    return shape[dim] % size == 0 and shape[dim] >= size


def leaf_partition_spec(
    path_str: str,
    leaf,
    *,
    model_size: int = 1,
    data_size: int = 1,
    tp: bool = False,
    fsdp: bool = False,
    min_size: int = 2**16,
) -> P:
    """PartitionSpec for one state leaf.

    Weight layout conventions (flax): Dense kernels ``[..., in, out]``,
    Conv kernels ``[..., kh, kw, in, out]``; ``nn.scan`` stages prepend a
    block axis — so "out" is always dim -1 and "in" dim -2. 1-D leaves
    (biases, LN scales) and anything smaller than ``min_size`` elements
    replicate: their memory/compute is negligible and sharding them only
    buys collective latency.
    """
    shape = getattr(leaf, "shape", ())
    ndim = len(shape)
    if ndim < 2 or int(np.prod(shape)) < min_size:
        return P()

    spec = [None] * ndim

    if tp and model_size > 1:
        row = any(n in path_str for n in _ROW_PARALLEL)
        prefer = (-2, -1) if row else (-1, -2)
        for d in prefer:
            if _dim_divisible(shape, d, model_size):
                spec[d] = "model"
                break

    if fsdp and data_size > 1:
        # largest remaining dim divisible by the data axis
        free = [d for d in range(ndim) if spec[d] is None]
        free.sort(key=lambda d: shape[d], reverse=True)
        for d in free:
            if _dim_divisible(shape, d, data_size):
                spec[d] = "data"
                break

    if all(s is None for s in spec):
        return P()  # fully replicated (PartitionSpec() != P(None,...))
    return P(*spec)


def batch_partition_spec(leaf, *, model_size: int = 1, sp: bool = False) -> P:
    """PartitionSpec for one batch leaf: 'data' on dim 0, plus — under
    sequence parallelism — 'model' on the spatial H dim.

    ``sp`` is the activation-sharding analogue of TP: NHWC batch tensors
    shard their height over the 'model' axis, so the *activations* of the
    convolutional/elementwise span are distributed and XLA's SPMD
    partitioner inserts halo exchanges for convs and all-gathers where an
    op genuinely needs the full extent (attention). The reference has no
    counterpart (DDP replicates activations per GPU); this is the mesh
    regime that cuts activation memory at large input sizes. As with every
    GSPMD regime here, a spec only changes communication, never math
    (tests/test_tensor_parallel.py::test_sequence_parallel_step).
    """
    shape = getattr(leaf, "shape", ())
    if len(shape) == 0:
        return P()
    spec = ["data"] + [None] * (len(shape) - 1)
    if (
        sp
        and model_size > 1
        and len(shape) >= 3  # N H ... C — only shard a real spatial dim
        and _dim_divisible(shape, 1, model_size)
    ):
        spec[1] = "model"
    return P(*spec)


def state_shardings(
    tree: Any,
    mesh: Mesh,
    *,
    tp: bool = True,
    fsdp: bool = False,
    min_size: int = 2**16,
) -> Any:
    """NamedSharding pytree for a TrainState (or any state pytree)."""
    model_size = mesh.shape.get("model", 1)
    data_size = mesh.shape.get("data", 1)

    def one(path, leaf):
        spec = leaf_partition_spec(
            jax.tree_util.keystr(path),
            leaf,
            model_size=model_size,
            data_size=data_size,
            tp=tp,
            fsdp=fsdp,
            min_size=min_size,
        )
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_pytree(tree: Any, shardings: Any) -> Any:
    """device_put every leaf onto its sharding (host->sharded transfer)."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def sharded_state_and_batch(
    state,
    batch,
    mesh: Mesh,
    *,
    tp: bool = True,
    fsdp: bool = False,
    sp: bool = False,
    min_size: int = 2**16,
):
    """Shard a TrainState per the TP/FSDP rules and a batch along 'data'
    (plus the spatial dim along 'model' under ``sp``).

    The jitted train step needs no changes: computation follows data, and
    XLA's SPMD partitioner inserts the collectives implied by the input
    shardings.
    """
    shardings = state_shardings(
        state, mesh, tp=tp, fsdp=fsdp, min_size=min_size
    )
    sharded_state = shard_pytree(state, shardings)
    model_size = mesh.shape.get("model", 1)
    sharded_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x,
            NamedSharding(
                mesh, batch_partition_spec(x, model_size=model_size, sp=sp)
            ),
        ),
        batch,
    )
    return sharded_state, sharded_batch
