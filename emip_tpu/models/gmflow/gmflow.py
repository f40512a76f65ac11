"""GMFlow assembly: transformer matching flow estimator, feature-list driven.

flax re-design of the reference flow engine (``gmflow/gmflow.py:12-162``).
Key property kept from the reference's *modified* GMFlow: ``__call__`` takes
already-extracted feature lists, not images — the CNN encoder is owned and
invoked by the enclosing two-stream model so prompt features can be injected
between encoding and matching (reference: gmflow.py:81).

Bidirectional prediction rides the batch axis (2B) through the transformer,
the correlation softmax, flow propagation, and convex upsampling — one set
of kernels serves both directions.

Returns (flow_fw_list, flow_bw_list, corr_volume) where corr_volume is the
raw pre-softmax [B, H, W, H*W] correlation consumed as the motion prompt.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from emip_tpu.models.gmflow.encoder import CNNEncoder
from emip_tpu.models.gmflow.matching import (
    global_correlation_softmax,
    local_correlation_softmax,
)
from emip_tpu.models.gmflow.transformer import (
    FeatureFlowAttention,
    FeatureTransformer,
)
from emip_tpu.ops.geometry import flow_warp
from emip_tpu.ops.position import sine_position_embedding
from emip_tpu.ops.pallas.convex_upsample import convex_upsample_pallas
from emip_tpu.ops.upsample import upsample_flow_bilinear
from emip_tpu.ops.window import window_merge, window_split

Dtype = Any


@dataclasses.dataclass(frozen=True)
class GMFlowConfig:
    num_scales: int = 1
    upsample_factor: int = 8
    feature_channels: int = 128
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4
    attn_splits_list: tuple[int, ...] = (2,)
    corr_radius_list: tuple[int, ...] = (-1,)
    prop_radius_list: tuple[int, ...] = (-1,)
    pred_bidir_flow: bool = True
    use_fused_attn: bool = True  # fused Pallas window-attention layers


def _add_position(feature0, feature1, attn_splits: int, channels: int):
    """Add sine position embedding, per attention window when splits > 1.

    (reference: gmflow/utils.py:66-86)
    """
    _, h, w, _ = feature0.shape
    if attn_splits > 1:
        f0 = window_split(feature0, attn_splits)
        f1 = window_split(feature1, attn_splits)
        pos = sine_position_embedding(f0.shape[1], f0.shape[2], channels)
        f0 = f0 + pos.astype(f0.dtype)
        f1 = f1 + pos.astype(f1.dtype)
        return window_merge(f0, attn_splits), window_merge(f1, attn_splits)
    pos = sine_position_embedding(h, w, channels)
    return feature0 + pos.astype(feature0.dtype), feature1 + pos.astype(
        feature1.dtype
    )


class GMFlow(nn.Module):
    config: GMFlowConfig = GMFlowConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.backbone = CNNEncoder(output_dim=cfg.feature_channels,
                                   dtype=self.dtype)
        self.transformer = FeatureTransformer(
            num_layers=cfg.num_transformer_layers,
            d_model=cfg.feature_channels,
            ffn_dim_expansion=cfg.ffn_dim_expansion,
            use_fused_attn=cfg.use_fused_attn,
            dtype=self.dtype,
        )
        self.feature_flow_attn = FeatureFlowAttention(
            in_channels=cfg.feature_channels, dtype=self.dtype
        )
        self.upsampler_conv1 = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                                       name="upsampler_conv1")
        self.upsampler_conv2 = nn.Conv(
            cfg.upsample_factor**2 * 9, (1, 1), dtype=self.dtype,
            name="upsampler_conv2",
        )

    def encode(self, image):
        """CNN features of one frame (invoked separately by the host model)."""
        return self.backbone(image)

    def _upsample_mask(self, flow, feature):
        concat = jnp.concatenate([flow.astype(feature.dtype), feature], axis=-1)
        return self.upsampler_conv2(nn.relu(self.upsampler_conv1(concat)))

    def __call__(
        self,
        feature0_list: Sequence[jnp.ndarray],
        feature1_list: Sequence[jnp.ndarray],
        training: bool = False,
    ):
        cfg = self.config
        assert (
            len(cfg.attn_splits_list)
            == len(cfg.corr_radius_list)
            == len(cfg.prop_radius_list)
            == cfg.num_scales
        )

        flow = None
        flow_preds = []
        corr_volume = None

        for scale_idx in range(cfg.num_scales):
            feature0 = feature0_list[scale_idx]
            feature1 = feature1_list[scale_idx]

            if cfg.pred_bidir_flow and scale_idx > 0:
                feature0, feature1 = (
                    jnp.concatenate([feature0, feature1], axis=0),
                    jnp.concatenate([feature1, feature0], axis=0),
                )

            upsample_factor = cfg.upsample_factor * (
                2 ** (cfg.num_scales - 1 - scale_idx)
            )

            if scale_idx > 0:
                flow = upsample_flow_bilinear(flow, 2)  # x2 res, x2 magnitude

            if flow is not None:
                flow = jax.lax.stop_gradient(flow)
                feature1 = flow_warp(feature1, flow)

            attn_splits = cfg.attn_splits_list[scale_idx]
            corr_radius = cfg.corr_radius_list[scale_idx]
            prop_radius = cfg.prop_radius_list[scale_idx]

            feature0, feature1 = _add_position(
                feature0, feature1, attn_splits, cfg.feature_channels
            )
            feature0, feature1 = self.transformer(
                feature0, feature1, attn_num_splits=attn_splits
            )

            if corr_radius == -1:
                flow_pred, _, corr_volume = global_correlation_softmax(
                    feature0, feature1, cfg.pred_bidir_flow
                )
            else:
                flow_pred, _ = local_correlation_softmax(
                    feature0, feature1, corr_radius
                )

            flow = flow + flow_pred if flow is not None else flow_pred

            if training:  # intermediate supervision before propagation
                flow_preds.append(
                    upsample_flow_bilinear(flow, upsample_factor)
                )

            if cfg.pred_bidir_flow and scale_idx == 0:
                feature0 = jnp.concatenate([feature0, feature1], axis=0)

            flow = self.feature_flow_attn(
                feature0,
                jax.lax.stop_gradient(flow),
                local_window_attn=prop_radius > 0,
                local_window_radius=prop_radius,
            )

            if training and scale_idx < cfg.num_scales - 1:
                flow_preds.append(
                    upsample_flow_bilinear(flow, upsample_factor)
                )

            if scale_idx == cfg.num_scales - 1:
                mask = self._upsample_mask(flow, feature0)
                flow_preds.append(
                    convex_upsample_pallas(flow, mask, cfg.upsample_factor)
                )

        flow_fw = [jnp.split(f, 2, axis=0)[0] for f in flow_preds]
        flow_bw = [jnp.split(f, 2, axis=0)[1] for f in flow_preds]
        return flow_fw, flow_bw, corr_volume
