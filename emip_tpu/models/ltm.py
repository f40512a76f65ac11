"""Long-term memory (LTM): space-time-memory prompt buffer.

Re-design of the reference STM mechanism (``model/EMIP_long/LTM.py``):
key/value maps are computed from the fused (segmentation feature +
correlation prompt) map of each past frame; reading attends the query
frame's key over all memory keys (softmax over time x space) and returns the
weighted value sum concatenated with the query value.

TPU-first: the rolling "last <= 5 frames" buffer (model_long.py:102-107)
becomes a *fixed-shape* [B, T_max, H, W, C] ring with a per-slot validity
mask, so streaming inference threads it through ``lax.scan`` with static
shapes. Pushing = roll along T + write slot T-1; invalid slots are masked to
-inf before the read softmax.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class MemoryState(NamedTuple):
    """Fixed-shape rolling memory: slots ordered oldest -> newest."""

    keys: jnp.ndarray  # [B, T_max, H, W, Ck]
    values: jnp.ndarray  # [B, T_max, H, W, Cv]
    valid: jnp.ndarray  # [B, T_max] bool

    @classmethod
    def zeros(cls, batch: int, t_max: int, h: int, w: int,
              key_dim: int = 128, val_dim: int = 128, dtype=jnp.float32):
        return cls(
            keys=jnp.zeros((batch, t_max, h, w, key_dim), dtype),
            values=jnp.zeros((batch, t_max, h, w, val_dim), dtype),
            valid=jnp.zeros((batch, t_max), bool),
        )

    def push(self, key: jnp.ndarray, value: jnp.ndarray) -> "MemoryState":
        """Append a frame's (key, value) map, evicting the oldest slot."""
        keys = jnp.roll(self.keys, -1, axis=1).at[:, -1].set(key)
        values = jnp.roll(self.values, -1, axis=1).at[:, -1].set(value)
        valid = jnp.roll(self.valid, -1, axis=1).at[:, -1].set(True)
        return MemoryState(keys, values, valid)


class KeyValueHead(nn.Module):
    """Parallel 3x3 conv key/value heads (reference: LTM.py:71-79)."""

    key_dim: int = 128
    val_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = nn.Conv(self.key_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="key")(x)
        v = nn.Conv(self.val_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="value")(x)
        return k, v


class FusePrompt(nn.Module):
    """Fuse seg feature + correlation prompt: add then conv bottleneck.

    (reference: LTM.py:26-41 ``fusion`` — the ``conv1_m`` branch is dead
    there and omitted here.)
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, prompt, train: bool = False):
        x = feat + prompt
        x = nn.Conv(512, (3, 3), padding=1, dtype=self.dtype, name="expand")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn")(x)
        x = nn.relu(x)
        return nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                       name="project")(x)


def memory_read(
    state: MemoryState, q_key: jnp.ndarray, q_value: jnp.ndarray,
    impl: str = "fused",
) -> jnp.ndarray:
    """Attend query key over all valid memory slots; concat with q_value.

    q_key/q_value: [B, H, W, C]. Returns [B, H, W, Cv + Cq].
    (reference: LTM.py:44-68 ``Memory.forward``)

    ``impl="fused"`` (default) runs the softmax-over-time-x-space read as
    one Pallas kernel (:mod:`emip_tpu.ops.pallas.memory_attention`) so the
    [B, THW, HW] score/probability tensors — ~335 MB each at 512^2 with a
    5-slot memory — never touch HBM; ``"xla"`` keeps the reference-shaped
    einsum chain (testing oracle).
    """
    b, t, h, w, ck = state.keys.shape
    cv = state.values.shape[-1]
    mk = state.keys.reshape(b, t * h * w, ck)
    mv = state.values.reshape(b, t * h * w, cv)
    qk = q_key.reshape(b, h * w, ck)
    slot_mask = jnp.repeat(state.valid, h * w, axis=1)  # [B, THW]

    from emip_tpu.utils.knobs import resolve

    if resolve("ltm_read_impl", impl, env="EMIP_LTM_READ") == "fused":
        from emip_tpu.ops.pallas.memory_attention import (
            masked_memory_attention,
        )

        bias = jnp.where(slot_mask, 0.0, -1e9).astype(jnp.float32)
        mem = masked_memory_attention(
            qk, mk, mv, bias).reshape(b, h, w, cv)
    else:
        logits = jnp.einsum(
            "bmc,bnc->bmn", mk, qk, preferred_element_type=jnp.float32
        ) / (ck**0.5)  # [B, THW, HW]
        logits = jnp.where(slot_mask[:, :, None], logits, -1e9)
        probs = nn.softmax(logits, axis=1)  # over time x space

        mem = jnp.einsum(
            "bmn,bmc->bnc", probs.astype(mv.dtype), mv,
            preferred_element_type=jnp.float32,
        ).reshape(b, h, w, cv)
    return jnp.concatenate([mem.astype(q_value.dtype), q_value], axis=-1)


class LTM(nn.Module):
    """Key/value heads + fusion for the space-time-memory prompt buffer."""

    key_dim: int = 128
    val_dim: int = 128
    dtype: Dtype = jnp.float32

    def setup(self):
        self.kv_memory = KeyValueHead(self.key_dim, self.val_dim, self.dtype)
        self.kv_query = KeyValueHead(self.key_dim, self.val_dim, self.dtype)
        self.fuse = FusePrompt(self.dtype)

    def memorize(self, feat8, corr_emb, train: bool = False):
        """Key/value maps of a past frame (reference: LTM.py:103-111)."""
        fused = self.fuse(feat8, corr_emb, train)
        return self.kv_memory(fused)

    def read(self, state: MemoryState, feat8):
        """Memory read for the query frame (reference: LTM.py:122-132)."""
        q_key, q_value = self.kv_query(feat8)
        return memory_read(state, q_key, q_value)
