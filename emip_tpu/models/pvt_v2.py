"""PVTv2 pyramid vision transformer, TPU-first.

Re-design of the segmentation-stream encoder (reference: ``lib/pvt_v2.py``):
4 stages of overlapping patch embedding + spatial-reduction attention blocks.
b5 = dims [64,128,320,512], heads [1,2,5,8], depths [3,6,40,3], sr [8,4,2,1]
(lib/pvt_v2.py:396-401). Stage 3 (40 blocks @ H/16, 320-d) dominates compute.

TPU-first choices:
  * blocks of a stage are identical modules -> ``nn.scan`` stacks their
    params on a leading depth axis: one traced block per stage instead of 52,
    cutting trace/compile time by ~an order of magnitude;
  * optional ``nn.remat`` per block trades FLOPs for HBM during training;
  * features stay NHWC; attention flattens spatially only inside the block;
  * the spatial-reduction K/V path is a strided conv (maps to MXU), and the
    'linear' variant's AdaptiveAvgPool2d(7) is an area-resize matmul.

Checkpoint note: scanned params are [depth, ...]-stacked; the torch->JAX
converter stacks the reference's per-block tensors accordingly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from emip_tpu.ops.image import resize_area

Dtype = Any


@dataclasses.dataclass(frozen=True)
class PVTv2Config:
    embed_dims: tuple[int, ...] = (64, 128, 320, 512)
    num_heads: tuple[int, ...] = (1, 2, 5, 8)
    mlp_ratios: tuple[int, ...] = (4, 4, 4, 4)
    depths: tuple[int, ...] = (3, 6, 40, 3)
    sr_ratios: tuple[int, ...] = (8, 4, 2, 1)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    linear: bool = False
    remat: bool = True
    # None = full remat (recompute everything in backward); "dots" = save
    # matmul/conv outputs, recompute only elementwise (norms/gelu/softmax) —
    # cuts the recompute FLOPs at a modest activation-memory cost.
    remat_policy: str | None = None
    # lax.scan unroll factor for the per-stage block scan (>1 lets XLA fuse
    # across block boundaries at the cost of program size / compile time)
    scan_unroll: int = 1
    # fused Pallas MixFFN dwconv+gelu: "never" (default - measured slower
    # than XLA end-to-end, see MixFFN docstring) | "always" (tests)
    fused_ffn: str = "never"
    # fused Pallas SR-attention: "auto" (TPU) | "always" (tests) | "never"
    fused_attn: str = "auto"
    # MixFFN depthwise conv: "conv" (XLA grouped conv) | "shift"
    # (shifted-slice VPU madds; see MixFFN)
    ffn_dwconv: str = "conv"
    # MixFFN gelu: "exact" (XLA erf) | "poly" (erf-free degree-8 fit,
    # |err| 2.3e-4 — below bf16 activation noise; see ops/gelu.py)
    ffn_gelu: str = "exact"


# named variants mirroring the reference zoo (lib/pvt_v2.py:341-401)
PVT_V2_VARIANTS = {
    "pvt_v2_b0": PVTv2Config((32, 64, 160, 256), (1, 2, 5, 8), (8, 8, 4, 4),
                             (2, 2, 2, 2), (8, 4, 2, 1)),
    "pvt_v2_b1": PVTv2Config((64, 128, 320, 512), (1, 2, 5, 8), (8, 8, 4, 4),
                             (2, 2, 2, 2), (8, 4, 2, 1)),
    "pvt_v2_b2": PVTv2Config((64, 128, 320, 512), (1, 2, 5, 8), (8, 8, 4, 4),
                             (3, 4, 6, 3), (8, 4, 2, 1)),
    "pvt_v2_b2_li": PVTv2Config((64, 128, 320, 512), (1, 2, 5, 8), (8, 8, 4, 4),
                                (3, 4, 6, 3), (8, 4, 2, 1), linear=True),
    "pvt_v2_b3": PVTv2Config((64, 128, 320, 512), (1, 2, 5, 8), (8, 8, 4, 4),
                             (3, 4, 18, 3), (8, 4, 2, 1)),
    "pvt_v2_b4": PVTv2Config((64, 128, 320, 512), (1, 2, 5, 8), (8, 8, 4, 4),
                             (3, 8, 27, 3), (8, 4, 2, 1)),
    "pvt_v2_b5": PVTv2Config((64, 128, 320, 512), (1, 2, 5, 8), (4, 4, 4, 4),
                             (3, 6, 40, 3), (8, 4, 2, 1)),
}

# Production defaults for the named variants (round-3 measurements, b5
# @352^2/bs=8 train step): erf-free poly gelu evaluated natively in the
# activation dtype (no fp32 round-trip; in fp32 runs it equals "poly",
# |err| 2.3e-4; in bf16 the Horner noise is ~3x bf16 rounding — see
# ops/gelu.py + tests/test_gelu.py) and a remat policy that saves the
# SR-attention output + FFN hidden activation per block. Measured chain:
# exact 143.9 -> poly 140.2 -> +save_attn_gelu 137.7 -> poly_native
# 135.8 ms (3-run means). Plain ``PVTv2Config(...)`` keeps
# exact-gelu/full-remat defaults — the oracle-parity tests rely on that.
PVT_V2_VARIANTS = {
    name: dataclasses.replace(
        cfg, ffn_gelu="poly_native", remat_policy="save_attn_gelu")
    for name, cfg in PVT_V2_VARIANTS.items()
}

# LayerNorm statistics are computed in fp32 by flax regardless of dtype;
# bf16 storage halves the HBM traffic of the many norms.
_LN = dict(epsilon=1e-6)
_trunc = nn.initializers.truncated_normal(stddev=0.02)


def _drop_path(x, rate, deterministic, rng):
    """Per-sample stochastic depth (timm convention: scale by 1/keep)."""
    import jax

    if deterministic:
        return x
    # rate is a traced f32 scalar under nn.scan (the per-block rates ride
    # the scan axis) — cast the 1/keep factor back so bf16 activations are
    # not promoted, which would break the scan carry dtype.
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape))
    return x * jnp.asarray(1.0 / keep, x.dtype) * mask.astype(x.dtype)


class _DenseParams(nn.Module):
    """kernel+bias params under the standard nn.Dense paths."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _trunc,
                            (self.in_features, self.features))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
        else:
            bias = jnp.zeros((self.features,), jnp.float32)
        return kernel, bias


class SRAttention(nn.Module):
    """Spatial-reduction multi-head attention on NHWC features.

    With ``use_fused`` (default on TPU) the q/kv/out projections and the
    per-head attention run as ONE Pallas kernel per image
    (:mod:`emip_tpu.ops.pallas.sr_attention`): the XLA chain's head-layout
    transposes + fp32 softmax round-trips were ~21 of the 54 ms/call b5
    training grad (tools/profile_pvt_grad.py). The spatial-reduction
    conv/LayerNorm (cheap, conv-shaped) stay in XLA. Parameter layout is
    identical either way.
    """

    dim: int
    num_heads: int
    sr_ratio: int
    qkv_bias: bool = True
    linear: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_fused: str = "auto"  # "auto" | "always" | "never"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        heads = self.num_heads
        ch = c // heads

        import jax as _jax

        from emip_tpu.utils.knobs import resolve

        fuse = (
            self.attn_drop == 0.0
            and self.proj_drop == 0.0
            and (self.use_fused == "always"
                 or (self.use_fused == "auto"
                     and _jax.default_backend() == "tpu"))
        )
        # int-typed so the env override parses "0"/"1" correctly
        # (bool("0") is True — resolve casts the raw string to type(value))
        fuse = bool(resolve("sr_attention_fused", int(fuse),
                            env="EMIP_SR_ATTN_FUSED"))
        if fuse:
            return self._fused(x, deterministic)

        q = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=_trunc,
                     dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, heads, ch)

        if not self.linear:
            if self.sr_ratio > 1:
                kv_in = nn.Conv(
                    c, (self.sr_ratio, self.sr_ratio),
                    strides=(self.sr_ratio, self.sr_ratio),
                    dtype=self.dtype, name="sr",
                )(x)
                kv_in = nn.LayerNorm(**_LN, dtype=self.dtype, name="norm")(kv_in)
            else:
                kv_in = x
        else:
            pooled = resize_area(x, (7, 7))
            kv_in = nn.Conv(c, (1, 1), dtype=self.dtype, name="sr")(pooled)
            kv_in = nn.LayerNorm(**_LN, dtype=self.dtype, name="norm")(kv_in)
            kv_in = nn.gelu(kv_in, approximate=False)

        m = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, kernel_init=_trunc,
                      dtype=self.dtype, name="kv")(kv_in)
        kv = kv.reshape(b, m, 2, heads, ch)
        k, v = kv[:, :, 0], kv[:, :, 1]

        scale = ch**-0.5
        # bf16 MXU matmul with fp32 accumulation; softmax in fp32
        attn = jnp.einsum(
            "bnhc,bmhc->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = nn.softmax(attn, axis=-1)
        if self.attn_drop > 0:
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum(
            "bhnm,bmhc->bnhc", attn.astype(x.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = out.reshape(b, h, w, c).astype(x.dtype)
        out = nn.Dense(c, kernel_init=_trunc, dtype=self.dtype, name="proj")(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out

    def _kv_input(self, x):
        """Spatial-reduction path producing [B, M, C] kv tokens (XLA)."""
        b, h, w, c = x.shape
        if not self.linear:
            if self.sr_ratio > 1:
                kv_in = nn.Conv(
                    c, (self.sr_ratio, self.sr_ratio),
                    strides=(self.sr_ratio, self.sr_ratio),
                    dtype=self.dtype, name="sr",
                )(x)
                kv_in = nn.LayerNorm(**_LN, dtype=self.dtype,
                                     name="norm")(kv_in)
            else:
                kv_in = x
        else:
            pooled = resize_area(x, (7, 7))
            kv_in = nn.Conv(c, (1, 1), dtype=self.dtype, name="sr")(pooled)
            kv_in = nn.LayerNorm(**_LN, dtype=self.dtype, name="norm")(kv_in)
            kv_in = nn.gelu(kv_in, approximate=False)
        return kv_in.reshape(b, -1, c)

    def _fused(self, x, deterministic):
        from emip_tpu.ops.pallas.sr_attention import fused_sr_attention

        b, h, w, c = x.shape
        kv_in = self._kv_input(x)
        wq, bq = _DenseParams(c, c, use_bias=self.qkv_bias, name="q")()
        wkv, bkv = _DenseParams(c, 2 * c, use_bias=self.qkv_bias,
                                name="kv")()
        wp, bp = _DenseParams(c, c, name="proj")()
        out = fused_sr_attention(
            x.reshape(b, h * w, c),
            kv_in.astype(x.dtype),
            wq.astype(self.dtype), bq,
            wkv.astype(self.dtype), bkv,
            wp.astype(self.dtype), bp,
            self.num_heads,
        )
        # name the output so remat_policy="save_attn" can store it: under
        # plain full remat the block backward re-runs this forward kernel
        # AND the bwd kernel recomputes internally (double recompute)
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, "sr_attn_out")
        return out.reshape(b, h, w, c).astype(x.dtype)


class _DWConvParams(nn.Module):
    """kernel+bias params under the standard depthwise nn.Conv paths."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 1, self.features)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class MixFFN(nn.Module):
    """Dense -> 3x3 depthwise conv -> GELU -> Dense (reference Mlp+DWConv).

    A Pallas dwconv+GELU fusion exists (:mod:`emip_tpu.ops.pallas.mixffn`)
    but is OFF by default: both it (170 f/s) and a full fc1+dw+gelu+fc2
    fusion (195 f/s) measured SLOWER end-to-end than XLA's own lowering
    (230 f/s) — XLA fuses this chain well already. Kept behind
    use_fused="always" for the CPU equivalence tests / future revisits.
    """

    dim: int
    hidden: int
    linear: bool = False
    drop: float = 0.0
    use_fused: str = "never"  # "always" | "never" (see docstring)
    # depthwise-conv formulation: "conv" (XLA grouped conv) | "shift"
    # (9 shifted-slice multiply-adds — pure VPU elementwise; depthwise
    # convs don't map to the MXU, so XLA's grouped-conv lowering can lose
    # to the explicit shift form, especially in the backward)
    dwconv_impl: str = "conv"
    gelu_impl: str = "exact"  # "exact" (XLA erf) | "poly" (ops/gelu.py)
    dtype: Dtype = jnp.float32

    def _bwd_fused_fits(self, b, h, w):
        """VMEM gate for the bwd-fused kernel: one grid cell holds several
        fp32 [H*W, hidden] temporaries, so cap the per-image tile size
        (oversized shapes — e.g. b5 stage 1 at 512^2 — fall back to the
        nn.Conv path with XLA's backward)."""
        from emip_tpu.utils.knobs import resolve

        max_elems = resolve("dwg_bwd_max_elems", 2_000_000,
                            env="EMIP_DWG_BWD_MAX_ELEMS")
        return h * w * self.hidden <= max_elems

    def _gelu(self, y):
        if self.gelu_impl == "poly":
            from emip_tpu.ops.gelu import gelu_poly

            return gelu_poly(y)
        if self.gelu_impl == "poly_native":
            from emip_tpu.ops.gelu import gelu_poly_native

            return gelu_poly_native(y)
        return nn.gelu(y, approximate=False)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from emip_tpu.ops.pallas.mixffn import fused_dwconv_gelu

        b, h, w, c = x.shape
        fuse = (
            not self.linear
            and self.drop == 0.0
            and self.use_fused == "always"
        )
        from jax.ad_checkpoint import checkpoint_name

        y = nn.Dense(self.hidden, kernel_init=_trunc, dtype=self.dtype,
                     name="fc1")(x)
        if self.linear:
            y = nn.relu(y)
        # named so remat policies can save it (skips the fc1 matmul +
        # dwconv recompute in the backward)
        y = checkpoint_name(y, "ffn_fc1_out")
        if fuse:
            wdw, bdw = _DWConvParams(self.hidden, name="dwconv")()
            y = fused_dwconv_gelu(
                y.reshape(b, h * w, self.hidden),
                wdw.reshape(3, 3, self.hidden).astype(self.dtype), bdw, h, w,
            ).reshape(b, h, w, self.hidden)
        elif self.dwconv_impl == "bwd_fused" and self._bwd_fused_fits(b, h, w):
            from emip_tpu.ops.pallas.mixffn import dwconv_gelu_bwd_fused

            wdw, bdw = _DWConvParams(self.hidden, name="dwconv")()
            y = dwconv_gelu_bwd_fused(
                y.reshape(b, h * w, self.hidden),
                wdw.reshape(3, 3, self.hidden).astype(self.dtype),
                bdw, h, w, self.gelu_impl,
            ).reshape(b, h, w, self.hidden)
            # keep the save_attn_gelu remat contract: the gelu output is
            # the saved tensor; the bwd kernel's residual (fc1_out) is
            # recomputed by remat exactly as in the "conv" path
            y = checkpoint_name(y, "ffn_gelu_out")
        elif self.dwconv_impl == "shift":
            # identical params to the nn.Conv path (kernel [3,3,1,hidden])
            wdw, bdw = _DWConvParams(self.hidden, name="dwconv")()
            wdw = wdw.astype(y.dtype)
            pad = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = None
            for dy in range(3):
                for dx in range(3):
                    term = pad[:, dy : dy + h, dx : dx + w, :] * wdw[dy, dx, 0]
                    acc = term if acc is None else acc + term
            y = acc + bdw.astype(y.dtype)
            y = self._gelu(y)
        else:
            y = nn.Conv(self.hidden, (3, 3), padding=1,
                        feature_group_count=self.hidden, dtype=self.dtype,
                        name="dwconv")(y)
            # named so remat_policy="save_attn_dwconv" can store it: the
            # backward then needs NO fc1/dwconv recompute for the gelu VJP
            # (gelu_out re-derives from this via one cheap elementwise pass)
            y = checkpoint_name(y, "ffn_dwconv_out")
            y = self._gelu(y)
            # named so remat_policy="save_attn_gelu" can store it
            y = checkpoint_name(y, "ffn_gelu_out")
        if self.drop > 0:
            y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        y = nn.Dense(self.dim, kernel_init=_trunc, dtype=self.dtype,
                     name="fc2")(y)
        if self.drop > 0:
            y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        return y


class PVTBlock(nn.Module):
    """Pre-norm SR-attention + MixFFN block with stochastic depth.

    Written in scan form: ``__call__(x, drop_path_rate) -> (x, ())`` so a
    whole stage is one ``nn.scan`` over the depth axis.
    """

    dim: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    qkv_bias: bool = True
    linear: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    fused_ffn: str = "auto"
    fused_attn: str = "auto"
    ffn_dwconv: str = "conv"
    ffn_gelu: str = "exact"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, drop_path_rate, deterministic: bool = True):
        from jax.ad_checkpoint import checkpoint_name

        n1 = checkpoint_name(
            nn.LayerNorm(**_LN, dtype=self.dtype, name="norm1")(x),
            "norm1_out")
        attn_out = SRAttention(
            self.dim, self.num_heads, self.sr_ratio, self.qkv_bias,
            self.linear, self.attn_drop, self.drop,
            use_fused=self.fused_attn, dtype=self.dtype,
            name="attn",
        )(n1, deterministic)
        if not deterministic:
            attn_out = _drop_path(
                attn_out, drop_path_rate, deterministic,
                self.make_rng("droppath"),
            )
        x = x + attn_out

        n2 = checkpoint_name(
            nn.LayerNorm(**_LN, dtype=self.dtype, name="norm2")(x),
            "norm2_out")
        mlp_out = MixFFN(
            self.dim, int(self.dim * self.mlp_ratio), self.linear, self.drop,
            use_fused=self.fused_ffn, dwconv_impl=self.ffn_dwconv,
            gelu_impl=self.ffn_gelu, dtype=self.dtype, name="mlp",
        )(n2, deterministic)
        if not deterministic:
            mlp_out = _drop_path(
                mlp_out, drop_path_rate, deterministic,
                self.make_rng("droppath"),
            )
        x = x + mlp_out
        return x, ()


class OverlapPatchEmbed(nn.Module):
    """Strided overlapping conv patch embedding + LayerNorm."""

    patch_size: int
    stride: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            padding=self.patch_size // 2,
            dtype=self.dtype,
            name="proj",
        )(x)
        return nn.LayerNorm(**_LN, dtype=self.dtype, name="norm")(x)


class PVTv2(nn.Module):
    """4-stage pyramid encoder; returns NHWC features at /4, /8, /16, /32."""

    config: PVTv2Config = PVTv2Config()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from emip_tpu.utils.knobs import resolve

        cfg = self.config
        deterministic = not train
        # stochastic-depth schedule: linear ramp over all blocks
        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.depths))
        cur = 0
        outs = []
        # range over configured stages (not a hard 4) so truncated configs
        # (per-stage profiling) work
        for i in range(len(cfg.depths)):
            x = OverlapPatchEmbed(
                patch_size=7 if i == 0 else 3,
                stride=4 if i == 0 else 2,
                embed_dim=cfg.embed_dims[i],
                dtype=self.dtype,
                name=f"patch_embed{i + 1}",
            )(x)

            block_cls = PVTBlock
            if cfg.remat:
                import jax

                policy = None
                if cfg.remat_policy == "dots":
                    policy = (jax.checkpoint_policies
                              .dots_with_no_batch_dims_saveable)
                elif cfg.remat_policy == "save_attn":
                    policy = (jax.checkpoint_policies
                              .save_only_these_names("sr_attn_out"))
                elif cfg.remat_policy == "save_attn_gelu":
                    policy = (jax.checkpoint_policies
                              .save_only_these_names("sr_attn_out",
                                                     "ffn_gelu_out"))
                elif cfg.remat_policy == "save_attn_dwconv":
                    policy = (jax.checkpoint_policies
                              .save_only_these_names("sr_attn_out",
                                                     "ffn_dwconv_out"))
                elif cfg.remat_policy == "save_attn_dwconv_norms":
                    # + the two (narrow-width) LN outputs: the block
                    # backward then recomputes only fc1 (for the dwconv
                    # weight grad) and one elementwise gelu
                    policy = (jax.checkpoint_policies
                              .save_only_these_names("sr_attn_out",
                                                     "ffn_dwconv_out",
                                                     "norm1_out",
                                                     "norm2_out"))
                elif cfg.remat_policy == "save_attn_gelu_fc1":
                    policy = (jax.checkpoint_policies
                              .save_only_these_names("sr_attn_out",
                                                     "ffn_gelu_out",
                                                     "ffn_fc1_out"))
                elif cfg.remat_policy == "save_gelu":
                    policy = (jax.checkpoint_policies
                              .save_only_these_names("ffn_gelu_out"))
                elif cfg.remat_policy is not None:
                    policy = getattr(jax.checkpoint_policies, cfg.remat_policy)
                # static_argnums counts the module instance at index 0:
                # (module, x, drop_path_rate, deterministic)
                block_cls = nn.remat(
                    PVTBlock,
                    static_argnums=(3,),
                    prevent_cse=False,
                    policy=policy,
                )
            StageScan = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "droppath": True, "dropout": True},
                in_axes=(0, nn.broadcast),
                length=cfg.depths[i],
                unroll=cfg.scan_unroll,
            )
            rates = jnp.asarray(dpr[cur : cur + cfg.depths[i]], jnp.float32)
            cur += cfg.depths[i]
            x, _ = StageScan(
                dim=cfg.embed_dims[i],
                num_heads=cfg.num_heads[i],
                mlp_ratio=cfg.mlp_ratios[i],
                sr_ratio=cfg.sr_ratios[i],
                qkv_bias=cfg.qkv_bias,
                linear=cfg.linear,
                drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate,
                fused_ffn=cfg.fused_ffn,
                fused_attn=cfg.fused_attn,
                ffn_dwconv=resolve("ffn_dwconv", cfg.ffn_dwconv,
                                   env="EMIP_FFN_DWCONV"),
                ffn_gelu=cfg.ffn_gelu,
                dtype=self.dtype,
                name=f"stage{i + 1}",
            )(x, rates, deterministic)
            x = nn.LayerNorm(**_LN, dtype=self.dtype, name=f"norm{i + 1}")(x)
            outs.append(x)

        return tuple(outs)
