"""EMIP short-term model: the two-stream co-updater.

flax re-design of the reference's flagship model
(``model/EMIP_short/model.py:33-102`` ``CoUpdater``):

  segmentation stream: PVTv2 features for both frames;
  motion stream:       GMFlow CNN features for both frames;
  camouflage feeder:   inject seg features into flow features (Injector #1);
  flow estimation:     GMFlow transformer matching on the injected features,
                       returning bidirectional flow + the raw correlation
                       volume;
  motion collector:    embed the correlation volume (conv_corr 1936->968->128)
                       and inject it into the frame-1 seg features
                       (Injector #2);
  decode:              3-level dimensional reduction + neighbor-connection
                       decoder -> full-resolution mask logits.

The whole pair -> mask -> flow pipeline is one jittable device program.
Dead-but-checkpointed reference modules (model.py:53-84: dr2_new, dr3_new,
downscaling1, upscaling3/4) are created at init only, for checkpoint parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from emip_tpu.models.backbones import create_backbone
from emip_tpu.models.common import (
    DimensionalReduction,
    LayerNorm2d,
    NeighborConnectionDecoder,
)
from emip_tpu.models.gmflow import GMFlow, GMFlowConfig
from emip_tpu.models.prompt import Injector

Dtype = Any


@dataclasses.dataclass(frozen=True)
class EMIPShortConfig:
    backbone_name: str = "pvt_v2_b5"
    channel: int = 32
    inp_size: int = 352
    gmflow: GMFlowConfig = GMFlowConfig()
    include_dead_modules: bool = True  # checkpoint-format parity


class EMIPShort(nn.Module):
    config: EMIPShortConfig = EMIPShortConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        backbone, stage_channels = create_backbone(cfg.backbone_name, self.dtype)
        self.backbone = backbone
        self.stage_channels = stage_channels
        self.decoder = NeighborConnectionDecoder(cfg.channel, dtype=self.dtype)
        self.gmflow = GMFlow(config=cfg.gmflow, dtype=self.dtype)
        self.dr1 = DimensionalReduction(cfg.channel, dtype=self.dtype)
        self.dr2 = DimensionalReduction(cfg.channel, dtype=self.dtype)
        self.dr3 = DimensionalReduction(cfg.channel, dtype=self.dtype)

        fdim = cfg.gmflow.feature_channels
        # correlation embedding bottleneck: HW -> HW/2 -> feature width
        # (968 for 352^2 inputs, matching reference model.py:59-62)
        hw = (cfg.inp_size // 8) ** 2
        self.conv_corr_0 = nn.Conv(hw // 2, (3, 3), padding=1, dtype=self.dtype,
                                   name="conv_corr_0")
        self.conv_corr_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                         dtype=jnp.float32, name="conv_corr_bn")
        self.conv_corr_1 = nn.Conv(fdim, (3, 3), padding=1, dtype=self.dtype,
                                   name="conv_corr_1")

        self.injector = Injector(dim=fdim, dtype=self.dtype)
        self.injector1 = Injector(dim=fdim, dtype=self.dtype)

        if cfg.include_dead_modules:
            # reference model.py:53-84 — never on the forward path, but part
            # of the published checkpoint key space
            self.dr2_new = nn.Conv(32, (3, 3), strides=(2, 2), padding=1,
                                   dtype=self.dtype, name="dr2_new")
            self.dr3_new_conv0 = nn.Conv(64, (3, 3), strides=(2, 2), padding=1,
                                         dtype=self.dtype)
            self.dr3_new_bn0 = nn.BatchNorm(momentum=0.9, dtype=jnp.float32)
            self.dr3_new_conv1 = nn.Conv(32, (3, 3), strides=(2, 2), padding=1,
                                         dtype=self.dtype)
            self.dr3_new_bn1 = nn.BatchNorm(momentum=0.9, dtype=jnp.float32)
            self.downscaling1_conv = nn.Conv(128, (2, 2), strides=(2, 2),
                                             dtype=self.dtype)
            self.downscaling1_ln = LayerNorm2d()
            self.upscaling4_conv0 = nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                                     dtype=self.dtype)
            self.upscaling4_ln = LayerNorm2d()
            self.upscaling4_conv1 = nn.ConvTranspose(128, (2, 2), strides=(2, 2),
                                                     dtype=self.dtype)
            self.upscaling3_conv = nn.ConvTranspose(128, (2, 2), strides=(2, 2),
                                                    dtype=self.dtype)
            self.upscaling3_ln = LayerNorm2d()

    def _init_dead_modules(self):
        if not self.config.include_dead_modules or not self.is_initializing():
            return
        z64 = jnp.zeros((1, 8, 8, 64), self.dtype)
        z128 = jnp.zeros((1, 8, 8, 128), self.dtype)
        z320 = jnp.zeros((1, 8, 8, 320), self.dtype)
        z512 = jnp.zeros((1, 8, 8, 512), self.dtype)
        self.dr2_new(z128)
        self.dr3_new_bn1(
            self.dr3_new_conv1(
                self.dr3_new_bn0(self.dr3_new_conv0(z128), use_running_average=True)
            ),
            use_running_average=True,
        )
        self.downscaling1_ln(self.downscaling1_conv(z64))
        self.upscaling4_conv1(self.upscaling4_ln(self.upscaling4_conv0(z512)))
        self.upscaling3_ln(self.upscaling3_conv(z320))

    def seg_features(self, image, train: bool = False):
        """Last three backbone stages: /8, /16, /32 (e.g. 128/320/512-ch)."""
        stages = self.backbone(image, train=train)
        return stages[-3], stages[-2], stages[-1]

    def flow_features(self, image):
        """GMFlow CNN encoder features at /8 (list, per scale)."""
        return self.gmflow.encode(image)

    def conv_corr(self, corr, train: bool = False):
        """Embed the raw [B, H, W, HW] correlation volume to feature width."""
        y = self.conv_corr_0(corr.astype(self.dtype))
        y = nn.relu(self.conv_corr_bn(y, use_running_average=not train))
        return self.conv_corr_1(y)

    def decode(self, fea8, fea16, fea32, corr_emb, train: bool = False):
        """Motion-collector injection + 3-level reduction + NCD decode."""
        fea_new = self.injector1(fea8, corr_emb)
        z3 = self.dr1(fea_new, train)
        z4 = self.dr2(fea16, train)
        z5 = self.dr3(fea32, train)
        mask = self.decoder(z5, z4, z3, train)
        return mask, fea_new

    def encode_frame(self, image, train: bool = False):
        """Everything that depends on ONE frame: backbone stages, CNN flow
        features, and the camouflage-feeder injection. Pure per-frame (the
        stages use LayerNorm/InstanceNorm only — no running stats), so in
        streaming loops frame t's encoding can be cached and reused as
        frame t+1's "prev" encoding (the reference recomputes it every
        pair, model_long.py:80-86)."""
        fea = self.seg_features(image, train)
        gm = self.flow_features(image)[0]
        # camouflage feeder: segmentation prompts into the motion stream
        inj = self.injector(gm, fea[0])
        return dict(fea=fea, inj=inj)

    def pair_from_encodings(self, enc1, enc2, train: bool = False,
                            with_decode: bool = True):
        """The pair-dependent tail: flow engine, correlation embedding,
        and (optionally) the motion-collector decode of frame 1."""
        flow_fw, flow_bw, corr = self.gmflow(
            [enc1["inj"]], [enc2["inj"]], training=train
        )
        corr_emb = self.conv_corr(corr, train)
        mask = fea_new = None
        if with_decode:
            mask, fea_new = self.decode(
                enc1["fea"][0], enc1["fea"][1], enc1["fea"][2], corr_emb,
                train,
            )
        return dict(
            mask=mask,
            flow_fw=flow_fw,
            flow_bw=flow_bw,
            corr=corr,
            corr_emb=corr_emb,
            fea_1=enc1["fea"],
            fea_2=enc2["fea"],
            fea_new=fea_new,
        )

    def forward_full(self, image1, image2, train: bool = False):
        """Full two-stream forward; returns a dict of intermediates.

        (the long-term model reuses every piece of this computation)

        Per-frame encoder calls are kept deliberately: concatenating both
        frames into one doubled batch was measured ~25% SLOWER end-to-end
        on v5e (XLA schedules the two independent encoder calls better
        than one double-batch call at these shapes). That r1 measurement
        doubled EVERY encoder at inference; EMIP_PVT_DOUBLE_BATCH=1 gates
        a narrower variant (backbone only, flow path per-frame) for
        training A/Bs where per-op overhead in the 40-block stage-3 scan
        backward may dominate. Like every knob here it is resolved at
        TRACE time: set it before the first compile of the step —
        toggling it mid-process under a cached jit has no effect.
        """
        self._init_dead_modules()
        from emip_tpu.utils.knobs import resolve

        if resolve("pvt_double_batch", 0, "EMIP_PVT_DOUBLE_BATCH"):
            n = image1.shape[0]
            stages = self.seg_features(
                jnp.concatenate([image1, image2], axis=0), train)
            fea_1 = tuple(s[:n] for s in stages)
            fea_2 = tuple(s[n:] for s in stages)
            enc1 = dict(
                fea=fea_1,
                inj=self.injector(self.flow_features(image1)[0], fea_1[0]),
            )
            enc2 = dict(
                fea=fea_2,
                inj=self.injector(self.flow_features(image2)[0], fea_2[0]),
            )
        else:
            enc1 = self.encode_frame(image1, train)
            enc2 = self.encode_frame(image2, train)
        return self.pair_from_encodings(enc1, enc2, train)

    def __call__(self, image1, image2, train: bool = False):
        out = self.forward_full(image1, image2, train)
        return out["mask"], out["flow_fw"], out["flow_bw"]


class SegNetwork(nn.Module):
    """Static-image segmentation network: backbone + reduction + NCD.

    Equivalent role to the reference's ``Network`` (create_backbone.py:183-196)
    used for COD10K pretraining of the segmentation stream. Two deliberate
    fixes vs. the reference (SURVEY.md §7 #6): the decoder is fed through
    DimensionalReduction (the reference wires raw 128/320/512-ch features
    into a 32-ch decoder, which cannot execute), and the extra x8 upsample in
    ``Decoder.forward`` (which would produce 2816^2 outputs) is dropped —
    logits come out at input resolution.
    """

    backbone_name: str = "pvt_v2_b5"
    channel: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone, _ = create_backbone(self.backbone_name, self.dtype)
        stages = backbone(x, train=train)
        z3 = DimensionalReduction(self.channel, dtype=self.dtype, name="dr1")(
            stages[-3], train
        )
        z4 = DimensionalReduction(self.channel, dtype=self.dtype, name="dr2")(
            stages[-2], train
        )
        z5 = DimensionalReduction(self.channel, dtype=self.dtype, name="dr3")(
            stages[-1], train
        )
        return NeighborConnectionDecoder(self.channel, dtype=self.dtype,
                                         name="decoder")(z5, z4, z3, train)
