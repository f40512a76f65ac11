"""GPipe-style pipeline parallelism over a homogeneous block stack.

The reference has no pipeline parallelism at all (it scales via DDP only,
reference train.py:185-219); this module is the TPU-native growth path for
models whose depth outruns one chip's HBM. It maps directly onto how this
repo already *builds* deep stacks: every PVT stage is an ``nn.scan`` over
identical ``PVTBlock``s with parameters stacked on a leading depth axis
(emip_tpu/models/pvt_v2.py:530-537), which is exactly the layout a pipeline
wants — split the depth axis over a mesh axis and stream microbatches
through the stages with ``ppermute`` shifts over ICI.

Schedule
--------
Plain GPipe over ``S = mesh.shape[stage_axis]`` stages and ``M``
microbatches, run SPMD inside one ``shard_map``: at step ``t`` of
``T = M + S - 1`` total steps, stage ``s`` processes microbatch ``t - s``
(when ``0 <= t - s < M``). Every device computes every step — the pipeline
bubble (fraction ``(S-1)/T``) is idle *useful* time, not idle silicon, and
the activation handoff is a single ``ppermute`` to the next stage, which
XLA overlaps with compute. Gradients need no extra code: ``jax.grad``
transposes ``ppermute`` into the reverse shift, yielding the standard
backward pipeline for free.

This composes with the data axis: batch stays sharded on 'data' while the
block stack is sharded on 'model' (= the stage axis), so DP x PP runs in
one jit like the TP/FSDP regimes in emip_tpu/parallel/sharding.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_blocks"]


def _stage_forward(block_fn, local_params, x):
    """Run this device's contiguous slice of blocks sequentially."""

    def one(a, p):
        return block_fn(p, a), None

    out, _ = lax.scan(one, x, local_params)
    return out


def pipeline_blocks(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    mesh: Mesh,
    *,
    num_microbatches: int,
    stage_axis: str = "model",
    batch_axis: str | None = "data",
) -> jax.Array:
    """Apply ``L`` stacked blocks to ``x``, pipelined over ``stage_axis``.

    Semantically identical to the sequential scan
    ``for l in range(L): x = block_fn(params[l], x)`` — sharding changes
    communication, never math (tests/test_pipeline.py asserts equivalence
    against the single-device scan, values and grads).

    Args:
      block_fn: ``(params_l, x) -> x`` for ONE block; must preserve the
        activation's shape and dtype (true of any residual block, e.g.
        ``PVTBlock``) and must be per-sample independent — microbatching
        is only exact for blocks with no cross-batch coupling (LayerNorm
        yes, BatchNorm batch-stats no). It is traced at microbatch size.
      stacked_params: pytree whose leaves have a leading depth axis ``L``
        (the ``nn.scan`` parameter layout), ``L % S == 0``.
      x: ``[B, ...]`` activations; ``B`` is the global batch. With
        ``batch_axis`` set, ``B`` is additionally sharded over that mesh
        axis (DP x PP) and each data shard's local batch must divide by
        ``num_microbatches``.
      num_microbatches: GPipe ``M``; bubble fraction is ``(S-1)/(M+S-1)``,
        so pick ``M >= 4*S`` when latency matters.
      stage_axis / batch_axis: mesh axis names for stages / data shards.

    Returns:
      ``[B, ...]`` output, sharded like ``x``.
    """
    S = mesh.shape[stage_axis]
    M = num_microbatches
    param_spec = jax.tree_util.tree_map(
        lambda l: P(stage_axis), stacked_params
    )
    data_spec = P(batch_axis) if batch_axis else P()

    for leaf in jax.tree_util.tree_leaves(stacked_params):
        if leaf.shape[0] % S != 0:
            raise ValueError(
                f"depth {leaf.shape[0]} not divisible by {S} stages"
            )

    def body(local_params, x_local):
        # x_local: this data-shard's batch; local_params: K = L/S blocks.
        b_local = x_local.shape[0]
        if b_local % M != 0:
            raise ValueError(
                f"local batch {b_local} not divisible by "
                f"{M} microbatches"
            )
        micro = x_local.reshape(M, b_local // M, *x_local.shape[1:])
        s = lax.axis_index(stage_axis)
        T = M + S - 1

        def step(carry, t):
            act, outbuf = carry
            # stage 0 draws microbatch t from the input (clamped reads in
            # the drain phase feed the bubble; their outputs are never
            # committed), later stages consume the previous shift
            feed = lax.dynamic_index_in_dim(
                micro, jnp.minimum(t, M - 1), 0, keepdims=False
            )
            inp = jnp.where(s == 0, feed, act)
            out = _stage_forward(block_fn, local_params, inp)
            # hand to the next stage over ICI (no wraparound: GPipe)
            recv = (
                lax.ppermute(
                    out, stage_axis, [(i, i + 1) for i in range(S - 1)]
                )
                if S > 1
                else out
            )
            # the LAST stage emits microbatch t-(S-1) at step t; clamped
            # early writes (t < S-1) land on index 0 and are overwritten
            # by the genuine index-0 emission at t = S-1
            widx = jnp.clip(t - (S - 1), 0, M - 1)
            outbuf = lax.dynamic_update_index_in_dim(outbuf, out, widx, 0)
            return (recv, outbuf), None

        # mark the initial carry as device-varying over every manual axis
        # the step output varies over (stage via axis_index, data via the
        # sharded input) so the scan carry type is stable
        vary = (stage_axis,) + ((batch_axis,) if batch_axis else ())
        act0 = lax.pcast(
            jnp.zeros(micro.shape[1:], x_local.dtype), vary, to="varying"
        )
        # zeros_like(micro) already varies over the batch axis (it derives
        # from the sharded input); only the stage axis is missing
        outbuf0 = lax.pcast(
            jnp.zeros_like(micro), (stage_axis,), to="varying"
        )
        (_, outbuf), _ = lax.scan(step, (act0, outbuf0), jnp.arange(T))
        # only the last stage's buffer is the real output; psum is the
        # cheapest replication-correct way to publish it mesh-wide
        y = jnp.where(s == S - 1, outbuf, jnp.zeros_like(outbuf))
        y = lax.psum(y, stage_axis)
        return y.reshape(x_local.shape)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(param_spec, data_spec),
        out_specs=data_spec,
    )(stacked_params, x)
