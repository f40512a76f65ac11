"""EMIP long-term model: frozen short-term net + space-time-memory prompt.

Re-design of ``model/EMIP_long/model_long.py:52-117`` (``Model_long``): the
entire short-term two-stream network runs frozen (stop_gradient, mirroring
the reference's ``torch.no_grad()`` + parameter freeze); a rolling LTM
buffer of the last <= 5 frames' key/value maps provides a historical-feature
prompt that a fresh motion-collector + decoder head turns into the mask.

Differences kept deliberate and documented:
  * the reference computes a transposed correlation embedding ``corr_bw``
    inside no_grad and never uses it (model_long.py:80-84; SURVEY.md §7.12)
    — not replicated (pure wasted compute);
  * frame 0 (which the reference special-cases by pairing with frame 1 and
    returning the short-term mask) is handled by the caller, keeping
    ``step`` shape-stable for ``lax.scan`` streaming.

State is the fixed-shape :class:`MemoryState`; ``scan_video`` streams a whole
clip [B, T, H, W, 3] through ``lax.scan`` with the memory resident in HBM —
the TPU-native equivalent of the reference's per-frame python loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from emip_tpu.models.common import DimensionalReduction, NeighborConnectionDecoder
from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
from emip_tpu.models.ltm import LTM, MemoryState
from emip_tpu.models.prompt import Injector

Dtype = Any


class EMIPLong(nn.Module):
    config: EMIPShortConfig = EMIPShortConfig()
    memory_size: int = 5
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        fdim = cfg.gmflow.feature_channels
        self.short_term = EMIPShort(config=cfg, dtype=self.dtype)
        self.ltm = LTM(key_dim=fdim, val_dim=fdim, dtype=self.dtype)
        self.long_dr = DimensionalReduction(fdim, dtype=self.dtype)  # 256->128
        self.injector1 = Injector(dim=fdim, dtype=self.dtype)
        self.decoder = NeighborConnectionDecoder(cfg.channel, dtype=self.dtype)
        self.dr1 = DimensionalReduction(cfg.channel, dtype=self.dtype)

    def init_memory(self, batch: int, dtype=jnp.float32) -> MemoryState:
        h = w = self.config.inp_size // 8
        fdim = self.config.gmflow.feature_channels
        return MemoryState.zeros(batch, self.memory_size, h, w, fdim, fdim,
                                 dtype)

    def short_forward(self, image1, image2):
        """Frozen short-term forward (mask for frame 0 handling)."""
        out = self.short_term.forward_full(image1, image2, train=False)
        return jax.tree_util.tree_map(jax.lax.stop_gradient, out)

    def encode_frame(self, image):
        """Frozen per-frame short-term encoding (backbone + CNN flow
        features + camouflage injection). Pure in the frame, so streaming
        callers cache it: frame t's encoding is reused as frame t+1's
        "prev" — the reference re-encodes both frames of every pair
        (model_long.py:80-86), paying the backbone twice per frame."""
        enc = self.short_term.encode_frame(image, train=False)
        return jax.tree_util.tree_map(jax.lax.stop_gradient, enc)

    def step_cached(self, enc_prev, image_cur, state: MemoryState,
                    train: bool = False):
        """``step`` with the previous frame's encoding supplied.

        Returns (mask_long, enc_cur, new_state); thread ``enc_cur`` back
        in as the next step's ``enc_prev``. Equivalent math to ``step``
        (tests/test_long_feature_cache.py) minus the short-term decode,
        whose mask streaming callers discard anyway."""
        enc_cur = self.encode_frame(image_cur)
        s = self.short_term.pair_from_encodings(
            enc_prev, enc_cur, train=False, with_decode=False
        )
        s = jax.tree_util.tree_map(jax.lax.stop_gradient, s)

        k, v = self.ltm.memorize(s["fea_1"][0], s["corr_emb"], train)
        state_live = state.push(k, v)

        memory = self.ltm.read(state_live, s["fea_2"][0])  # [B,H,W,256]
        memory = self.long_dr(memory, train)

        fea_new = self.injector1(s["fea_2"][0], memory)
        z3 = self.dr1(fea_new, train)
        z4 = self.short_term.dr2(s["fea_2"][1], False)
        z5 = self.short_term.dr3(s["fea_2"][2], False)
        z4 = jax.lax.stop_gradient(z4)
        z5 = jax.lax.stop_gradient(z5)
        mask_long = self.decoder(z5, z4, z3, train)

        new_state = state.push(
            jax.lax.stop_gradient(k), jax.lax.stop_gradient(v)
        )
        return mask_long, enc_cur, new_state

    def step(self, image_prev, image_cur, state: MemoryState,
             train: bool = False):
        """One streaming step: memorize frame t-1, read for frame t, decode.

        Returns (mask_long, short_mask_prev, new_state). The short-term net
        is frozen; only LTM / injector / decoder heads receive gradients.
        New memory entries are written *detached* (truncated BPTT across
        frames, matching train_long.py:52-53), but the current step's read
        sees the fresh entry with gradient via the local memorize call.
        """
        s = self.short_forward(image_prev, image_cur)

        # memorize frame t-1: gradient flows into LTM.kv_memory this step
        k, v = self.ltm.memorize(s["fea_1"][0], s["corr_emb"], train)
        state_live = state.push(k, v)

        memory = self.ltm.read(state_live, s["fea_2"][0])  # [B,H,W,256]
        memory = self.long_dr(memory, train)

        fea_new = self.injector1(s["fea_2"][0], memory)
        z3 = self.dr1(fea_new, train)
        z4 = self.short_term.dr2(s["fea_2"][1], False)
        z5 = self.short_term.dr3(s["fea_2"][2], False)
        z4 = jax.lax.stop_gradient(z4)
        z5 = jax.lax.stop_gradient(z5)
        mask_long = self.decoder(z5, z4, z3, train)

        new_state = state.push(
            jax.lax.stop_gradient(k), jax.lax.stop_gradient(v)
        )
        return mask_long, s["mask"], new_state

    def __call__(self, image_prev, image_cur, state: MemoryState,
                 train: bool = False):
        return self.step(image_prev, image_cur, state, train)

    def scan_video(self, frames, train: bool = False):
        """Stream a clip [B, T, H, W, 3]; returns masks [B, T, H, W, 1].

        Frame 0's mask is the short-term prediction on (f0, f1) — the
        reference protocol (test_long.py:29-37); frames 1..T-1 come from the
        memory-prompted long head. Memory stays HBM-resident in the scan
        carry.
        """
        b, t = frames.shape[0], frames.shape[1]
        mask0 = self.short_forward(frames[:, 0], frames[:, 1])["mask"]

        # frame t's encoding rides the scan carry to serve as frame
        # t+1's prev — each frame is encoded ONCE (the per-frame
        # backbone is the dominant streaming cost; the reference's loop
        # encodes every frame twice)
        def body(mod, carry, cur):
            state, enc_prev = carry
            mask_long, enc_cur, new_state = mod.step_cached(
                enc_prev, cur, state, train
            )
            return (new_state, enc_cur), mask_long

        scan = nn.scan(
            body,
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        enc0 = self.encode_frame(frames[:, 0])
        carry0 = (self.init_memory(b, frames.dtype), enc0)
        _, masks = scan(self, carry0, jnp.moveaxis(frames[:, 1:], 1, 0))
        masks = jnp.moveaxis(masks, 0, 1)  # [B, T-1, H, W, 1]
        return jnp.concatenate([mask0[:, None], masks], axis=1)
