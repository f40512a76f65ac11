"""Train state: optimizer, LR schedule, and frozen-parameter partitioning.

The reference freezes GMFlow by flipping ``requires_grad`` on name-matched
parameters (train.py:340-342) and filters the optimizer accordingly
(train.py:380). The JAX-native equivalent: *partition* the param pytree into
(trainable, frozen) sub-trees by path predicate, differentiate only w.r.t.
the trainable tree (the frozen backward is never built — cheaper than
torch's requires_grad masking), and keep the frozen tree as a closure input.

Name-rule parity note: the reference nominally leaves GMFlow's
dwconv/adaptor params trainable, but those are dead in the forward, receive
no grads, and are skipped by torch AdamW — so the *effective* behavior,
reproduced here, is "GMFlow entirely frozen".

The LR schedule reproduces torch CosineAnnealingLR stepped once per epoch
**before** training (reference quirk, train.py:384-386: epoch e uses the
post-step value; the cosine is periodic so LR re-rises past T_max —
SURVEY.md §7.4).

Gradient clipping is element-wise value clamping to +-clip (the reference's
``clip_gradient``, utils/utils.py:1-11 — not norm clipping), i.e.
``optax.clip``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

__all__ = [
    "TrainState",
    "build_optimizer",
    "cosine_epoch_lr",
    "partition_params",
    "merge_params",
    "GMFLOW_FREEZE",
]


def GMFLOW_FREEZE(path: tuple[str, ...]) -> bool:
    """Freeze predicate for short-term training: the whole GMFlow subtree."""
    return "gmflow" in path


def SHORT_TERM_FREEZE(path: tuple[str, ...]) -> bool:
    """Freeze predicate for long-term training: the whole short-term net."""
    return "short_term" in path


def partition_params(params, freeze_fn: Callable[[tuple[str, ...]], bool]):
    """Split a param pytree into (trainable, frozen) by path predicate."""
    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if not freeze_fn(k)}
    frozen = {k: v for k, v in flat.items() if freeze_fn(k)}
    return (
        traverse_util.unflatten_dict(trainable),
        traverse_util.unflatten_dict(frozen),
    )


def merge_params(trainable, frozen):
    flat = dict(traverse_util.flatten_dict(trainable))
    flat.update(traverse_util.flatten_dict(frozen))
    return traverse_util.unflatten_dict(flat)


def cosine_epoch_lr(
    base_lr: float = 1e-5,
    eta_min: float = 1e-6,
    t_max: int = 30,
    pre_step: bool = True,
) -> Callable[[int], float]:
    """Per-epoch LR: torch CosineAnnealingLR semantics (periodic past T_max).

    ``pre_step=True`` reproduces the reference's scheduler-step-before-train
    quirk: epoch e trains at the LR of cosine step e (1-indexed).
    """

    def lr(epoch: int) -> float:
        t = epoch if pre_step else epoch - 1
        return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * t / t_max)) / 2

    return lr


def adp_lr(batch_size: int, base_batch: int = 36,
           base_lr: float = 1e-4) -> float:
    """Square-root batch-size LR scaling (reference's unused adp_lr,
    train.py:221-226; catalogued alternate)."""
    return base_lr * (batch_size / base_batch) ** 0.5


def build_optimizer(
    learning_rate: float = 1e-5,
    weight_decay: float = 1e-7,
    clip_value: float = 0.5,
) -> optax.GradientTransformation:
    """Element-wise grad value clamp -> AdamW, LR injectable per epoch."""
    return optax.chain(
        optax.clip(clip_value),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay
        ),
    )


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any  # trainable sub-tree
    frozen: Any  # frozen sub-tree (e.g. GMFlow)
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx, freeze_fn):
        trainable, frozen = partition_params(variables["params"], freeze_fn)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=trainable,
            frozen=frozen,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(trainable),
        )

    def full_params(self):
        return merge_params(self.params, self.frozen)

    def set_learning_rate(self, lr: float) -> "TrainState":
        """Update the injected AdamW learning rate (per-epoch schedule)."""
        opt_state = self.opt_state
        # chain state: (clip_state, inject_hyperparams_state)
        inject = opt_state[1]
        hyper = dict(inject.hyperparams)
        hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
        inject = inject._replace(hyperparams=hyper)
        return self._replace(opt_state=(opt_state[0], inject))
