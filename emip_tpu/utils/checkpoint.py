"""Checkpointing: orbax save/restore of params + optimizer state + step.

Improves on the reference, which only ever saved raw model state dicts
(``torch.save(model.state_dict())``, train.py:162,171) with *no optimizer
state and no resume* (SURVEY.md §5): here the full TrainState (trainable +
frozen params, batch stats, optimizer state, step) round-trips, which also
covers TPU preemption recovery.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint_step"]


def _manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(directory: str, state, step: int,
                    max_to_keep: int = 5) -> None:
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_checkpoint_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, template_state, step: int | None = None):
    """Restore into the structure of ``template_state`` (shapes must match)."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint under {directory}")
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, template_state
    )
    state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return state, step
