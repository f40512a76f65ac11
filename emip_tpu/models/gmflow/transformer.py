"""Flow feature transformer: swin-window self/cross attention + flow propagation.

flax re-design of the reference flow transformer
(``model/EMIP_short/motion/gmflow/transformer.py``):

* ``FeatureTransformer`` — 6 alternating {self-attn, cross-attn+FFN} blocks
  over the pair's features, shifted windows on odd blocks (:404-482).
  Features stay NHWC throughout (no [B, L, C] flattening round-trips); the
  two frames ride the batch axis so one kernel serves both directions.
* ``FeatureFlowAttention`` — full-resolution self-attention where the values
  are the flow field (:485-568), plus the local-window variant.

The shifted-window additive mask is a compile-time constant
(:mod:`emip_tpu.ops.window`). Attention math accumulates in fp32.

Each ``TransformerLayer`` also declares the reference's dead adaptor FCs
(transformer.py:148-151) at init time only, for checkpoint-format parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from emip_tpu.ops.window import shifted_window_mask, window_merge, window_split

Dtype = Any


def _attention(q, k, v, mask=None):
    """Single-head scaled-dot attention over flattened windows.

    q, k, v: [B, L, C]; optional additive mask [B, L, L] or broadcastable.
    bf16 MXU matmuls with fp32 accumulation; softmax in fp32.
    """
    c = q.shape[-1]
    scores = jnp.einsum(
        "blc,bmc->blm", q, k, preferred_element_type=jnp.float32
    ) / (c**0.5)
    if mask is not None:
        scores = scores + mask
    probs = nn.softmax(scores, axis=-1)
    out = jnp.einsum("blm,bmc->blc", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_splits: int,
    with_shift: bool,
) -> jnp.ndarray:
    """Swin-style (optionally shifted) window attention on NHWC tensors.

    (reference: transformer.py:46-105)
    """
    b, h, w, c = q.shape
    if num_splits <= 1:
        out = _attention(
            q.reshape(b, h * w, c), k.reshape(b, h * w, c), v.reshape(b, h * w, c)
        )
        return out.reshape(b, h, w, c)

    k_sp = num_splits
    win_h, win_w = h // k_sp, w // k_sp
    mask = None
    if with_shift:
        sh, sw = win_h // 2, win_w // 2
        q = jnp.roll(q, shift=(-sh, -sw), axis=(1, 2))
        k = jnp.roll(k, shift=(-sh, -sw), axis=(1, 2))
        v = jnp.roll(v, shift=(-sh, -sw), axis=(1, 2))
        # [K*K, win, win] tiled over batch: windows are ordered (b, ky, kx)
        m = shifted_window_mask(h, w, k_sp)
        mask = jnp.tile(m, (b, 1, 1))

    qw = window_split(q, k_sp).reshape(-1, win_h * win_w, c)
    kw = window_split(k, k_sp).reshape(-1, win_h * win_w, c)
    vw = window_split(v, k_sp).reshape(-1, win_h * win_w, c)

    out = _attention(qw, kw, vw, mask)
    out = window_merge(out.reshape(-1, win_h, win_w, c), k_sp)

    if with_shift:
        out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
    return out


class _ProjKernel(nn.Module):
    """Bare [in, out] kernel under the standard ``<name>/kernel`` path
    (weights feed the fused Pallas layer directly; checkpoint-compatible)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_features, self.features))


class _LNParams(nn.Module):
    """LayerNorm scale/bias params under the standard path."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class TransformerLayer(nn.Module):
    """One attention layer: Q from ``source``, K/V from ``target``.

    no_ffn=True for self-attention layers; cross-attention layers append a
    [source, message] MLP. (reference: transformer.py:108-211)

    With ``use_fused_attn`` the projection+attention+merge+LayerNorm+residual
    path runs as one Pallas kernel per (batch, window) grid cell
    (:mod:`emip_tpu.ops.pallas.window_attention`); parameter layout is
    identical either way.
    """

    d_model: int
    no_ffn: bool = False
    ffn_dim_expansion: int = 4
    with_shift: bool = False
    use_fused_attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, source, target, attn_num_splits: int = 1):
        c = self.d_model
        dense = lambda name: nn.Dense(c, use_bias=False, dtype=self.dtype, name=name)

        if self.use_fused_attn and attn_num_splits > 1:
            out = self._fused_attention(source, target, attn_num_splits,
                                        add_residual=self.no_ffn,
                                        with_ffn=not self.no_ffn)
            if self.is_initializing():
                self._init_dead_adaptors(c)
            return out
        else:
            q = dense("q_proj")(source)
            k = dense("k_proj")(target)
            v = dense("v_proj")(target)

            message = window_attention(q, k, v, attn_num_splits,
                                       self.with_shift)
            message = dense("merge")(message)
            message = nn.LayerNorm(dtype=self.dtype, name="norm1")(message)

        if not self.no_ffn:
            cat = jnp.concatenate([source, message], axis=-1)
            y = nn.Dense(2 * c * self.ffn_dim_expansion, use_bias=False,
                         dtype=self.dtype, name="mlp0")(cat)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="mlp2")(y)
            message = nn.LayerNorm(dtype=self.dtype, name="norm2")(y)

        # dead-but-checkpointed adaptor FCs (reference transformer.py:148-151)
        if self.is_initializing():
            self._init_dead_adaptors(c)

        return source + message

    def _init_dead_adaptors(self, c):
        dummy = jnp.zeros((1, c), self.dtype)
        hid = nn.Dense(c // 4, dtype=self.dtype, name="adaptor_fc1")(dummy)
        nn.Dense(c, dtype=self.dtype, name="adaptor_fc2")(hid)

    def _fused_attention(self, source, target, attn_num_splits: int,
                         add_residual: bool = True, with_ffn: bool = False):
        """Fused-kernel path.

        with_ffn=False: LN1(merge(attention)), optionally + source.
        with_ffn=True: the whole cross-attention layer incl. the concat-FFN
        and second LayerNorm (one kernel per window).
        """
        from emip_tpu.ops.pallas.window_attention import (
            fused_window_attention_ffn_layer,
            fused_window_attention_layer,
        )
        from emip_tpu.ops.window import (
            window_merge_tokens,
            window_split_tokens,
        )

        c = self.d_model
        b, h, w, _ = source.shape
        k_sp = attn_num_splits
        win_h, win_w = h // k_sp, w // k_sp

        wq = _ProjKernel(c, c, name="q_proj")()
        wk = _ProjKernel(c, c, name="k_proj")()
        wv = _ProjKernel(c, c, name="v_proj")()
        wm = _ProjKernel(c, c, name="merge")()
        scale, bias = _LNParams(c, name="norm1")()

        src, tgt = source, target
        mask = None
        if self.with_shift:
            sh, sw = win_h // 2, win_w // 2
            src = jnp.roll(src, shift=(-sh, -sw), axis=(1, 2))
            tgt = jnp.roll(tgt, shift=(-sh, -sw), axis=(1, 2))
            mask = shifted_window_mask(h, w, k_sp)

        xw = window_split_tokens(src, k_sp)
        tw = window_split_tokens(tgt, k_sp)
        if with_ffn:
            f = 2 * c * self.ffn_dim_expansion
            w0 = _ProjKernel(2 * c, f, name="mlp0")()
            w2 = _ProjKernel(f, c, name="mlp2")()
            scale2, bias2 = _LNParams(c, name="norm2")()
            out_w = fused_window_attention_ffn_layer(
                xw, tw, wq, wk, wv, wm, scale, bias, w0, w2, scale2, bias2,
                mask,
            )
        else:
            out_w = fused_window_attention_layer(
                xw, tw, wq, wk, wv, wm, scale, bias, mask,
                add_residual=add_residual,
            )
        out = window_merge_tokens(out_w, k_sp, h, w)
        if self.with_shift:
            out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
        return out


class _LayerParams(nn.Module):
    """Parameter-only twin of ``TransformerLayer`` (same names/paths).

    Used by the fused-block path so the whole block's weights can be handed
    to one Pallas kernel while the checkpoint layout stays byte-identical
    to the unfused modules.
    """

    d_model: int
    with_ffn: bool = False
    ffn_dim_expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        c = self.d_model
        out = dict(
            wq=_ProjKernel(c, c, name="q_proj")(),
            wk=_ProjKernel(c, c, name="k_proj")(),
            wv=_ProjKernel(c, c, name="v_proj")(),
            wm=_ProjKernel(c, c, name="merge")(),
        )
        out["s1"], out["b1"] = _LNParams(c, name="norm1")()
        if self.with_ffn:
            f = 2 * c * self.ffn_dim_expansion
            out["w0"] = _ProjKernel(2 * c, f, name="mlp0")()
            out["w2"] = _ProjKernel(f, c, name="mlp2")()
            out["s2"], out["b2"] = _LNParams(c, name="norm2")()
        if self.is_initializing():
            # dead-but-checkpointed adaptor FCs (transformer.py:148-151)
            dummy = jnp.zeros((1, c), self.dtype)
            hid = nn.Dense(c // 4, dtype=self.dtype, name="adaptor_fc1")(dummy)
            nn.Dense(c, dtype=self.dtype, name="adaptor_fc2")(hid)
        return out


class TransformerBlock(nn.Module):
    """Self-attention (no FFN) + cross-attention (with FFN).

    With ``use_fused_attn`` the whole block (both layers) runs as ONE
    Pallas kernel per (batch, window) grid cell
    (:func:`emip_tpu.ops.pallas.window_attention.fused_window_attention_block`)
    — per-cell sequencing overhead dominates at 484-token windows, so
    halving the invocation count beats two per-layer kernels.
    """

    d_model: int
    ffn_dim_expansion: int = 4
    with_shift: bool = False
    use_fused_attn: bool = False
    # whole-block kernel vs two per-layer kernels: the block kernel
    # wins at 352^2 windows (T=484; 230 -> 232 f/s) but measures
    # slightly SLOWER at 512^2 windows (T=1024: 54.1 vs 55.6 f/s
    # streaming) — larger VMEM working set. Default: block kernel
    # up to T=784; EMIP_FUSED_BLOCK_MAX_T env knob for A/B.
    fused_block_max_t: int = 784
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, source, target, attn_num_splits: int = 1):
        if self.use_fused_attn and attn_num_splits > 1:
            from emip_tpu.utils.knobs import resolve

            tok = (source.shape[1] // attn_num_splits) * (
                source.shape[2] // attn_num_splits)
            if tok <= resolve("fused_block_max_t", self.fused_block_max_t,
                              env="EMIP_FUSED_BLOCK_MAX_T"):
                return self._fused_block(source, target, attn_num_splits)
        source = TransformerLayer(
            self.d_model, no_ffn=True, ffn_dim_expansion=self.ffn_dim_expansion,
            with_shift=self.with_shift, use_fused_attn=self.use_fused_attn,
            dtype=self.dtype, name="self_attn",
        )(source, source, attn_num_splits)
        source = TransformerLayer(
            self.d_model, no_ffn=False, ffn_dim_expansion=self.ffn_dim_expansion,
            with_shift=self.with_shift, use_fused_attn=self.use_fused_attn,
            dtype=self.dtype, name="cross_attn_ffn",
        )(source, target, attn_num_splits)
        return source

    def _fused_block(self, source, target, attn_num_splits: int):
        from emip_tpu.ops.pallas.window_attention import (
            fused_window_attention_block,
        )
        from emip_tpu.ops.window import (
            window_merge_tokens,
            window_split_tokens,
        )

        c = self.d_model
        b, h, w, _ = source.shape
        k_sp = attn_num_splits
        win_h, win_w = h // k_sp, w // k_sp

        p_self = _LayerParams(c, with_ffn=False, dtype=self.dtype,
                              name="self_attn")()
        p_cross = _LayerParams(c, with_ffn=True,
                               ffn_dim_expansion=self.ffn_dim_expansion,
                               dtype=self.dtype, name="cross_attn_ffn")()

        src, tgt = source, target
        mask = None
        if self.with_shift:
            sh, sw = win_h // 2, win_w // 2
            src = jnp.roll(src, shift=(-sh, -sw), axis=(1, 2))
            tgt = jnp.roll(tgt, shift=(-sh, -sw), axis=(1, 2))
            mask = shifted_window_mask(h, w, k_sp)

        out_w = fused_window_attention_block(
            window_split_tokens(src, k_sp),
            window_split_tokens(tgt, k_sp),
            p_self, p_cross, mask,
        )
        out = window_merge_tokens(out_w, k_sp, h, w)
        if self.with_shift:
            out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
        return out


class FeatureTransformer(nn.Module):
    """Alternating self/cross swin attention over the frame pair.

    Inputs are NHWC [B, H, W, C] per frame; both directions are computed in
    one pass by stacking (f0, f1) and (f1, f0) on the batch axis.
    (reference: transformer.py:404-482)
    """

    num_layers: int = 6
    d_model: int = 128
    ffn_dim_expansion: int = 4
    use_fused_attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feature0, feature1, attn_num_splits: int = 1):
        b = feature0.shape[0]
        concat0 = jnp.concatenate([feature0, feature1], axis=0)  # [2B,H,W,C]
        concat1 = jnp.concatenate([feature1, feature0], axis=0)

        for i in range(self.num_layers):
            concat0 = TransformerBlock(
                self.d_model,
                ffn_dim_expansion=self.ffn_dim_expansion,
                with_shift=(i % 2 == 1),
                use_fused_attn=self.use_fused_attn,
                dtype=self.dtype,
                name=f"layer{i}",
            )(concat0, concat1, attn_num_splits)
            # refresh the cross stream: swap the two halves
            concat1 = jnp.concatenate(
                [concat0[b:], concat0[:b]], axis=0
            )

        return concat0[:b], concat0[b:]


class FeatureFlowAttention(nn.Module):
    """Flow propagation: pixel self-attention with flow as values.

    Keeps the reference's quirk of deriving K from the already-Q-projected
    features (transformer.py:517-524) so converted weights reproduce outputs.
    """

    in_channels: int = 128
    use_pallas: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feature0: jnp.ndarray,
        flow: jnp.ndarray,
        local_window_attn: bool = False,
        local_window_radius: int = 1,
    ):
        b, h, w, c = feature0.shape
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(feature0)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(q)

        if local_window_attn:
            return self._local(q, k, flow, local_window_radius)

        if self.use_pallas:
            from emip_tpu.ops.pallas import fused_flow_attention

            out = fused_flow_attention(
                q.reshape(b, h * w, c),
                k.reshape(b, h * w, c),
                flow.reshape(b, h * w, -1),
            )
            return out.reshape(b, h, w, flow.shape[-1]).astype(flow.dtype)

        scores = jnp.einsum(
            "bhwc,bpqc->bhwpq",
            q.astype(jnp.float32),
            k.astype(jnp.float32),
        ).reshape(b, h * w, h * w) / (c**0.5)
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "blm,bmc->blc", probs, flow.reshape(b, h * w, -1).astype(jnp.float32)
        )
        return out.reshape(b, h, w, flow.shape[-1]).astype(flow.dtype)

    def _local(self, q, k, flow, radius: int):
        """Local-window propagation (reference: transformer.py:535-568)."""
        b, h, w, c = q.shape
        ksz = 2 * radius + 1
        pad = [(0, 0), (radius, radius), (radius, radius), (0, 0)]
        k_pad = jnp.pad(k, pad)
        f_pad = jnp.pad(flow, pad)
        k_win = jnp.stack(
            [
                k_pad[:, dy : dy + h, dx : dx + w, :]
                for dy in range(ksz)
                for dx in range(ksz)
            ],
            axis=3,
        )  # [B, H, W, K2, C]
        f_win = jnp.stack(
            [
                f_pad[:, dy : dy + h, dx : dx + w, :]
                for dy in range(ksz)
                for dx in range(ksz)
            ],
            axis=3,
        )
        scores = jnp.einsum(
            "bhwc,bhwkc->bhwk", q.astype(jnp.float32), k_win.astype(jnp.float32)
        ) / (c**0.5)
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhwk,bhwkc->bhwc", probs, f_win.astype(jnp.float32))
        return out.astype(flow.dtype)
