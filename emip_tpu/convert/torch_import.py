"""Torch checkpoint conversion: reference ``.pth`` -> flax variable trees.

Converts the reference's published checkpoints — COD10K-pretrained
segmentation weights, the upstream ``gmflow_things`` flow weights, and full
EMIP snapshots — into this framework's parameter layout, reproducing the
reference's messy load-time remap rules (train.py:312-337: ``module.``
stripping, ``backbone.pvtv2_en -> backbone.feat_net.pvtv2_en``, ``GMFlow.``
prefixing) so published weights drop straight in.

Layout transforms:
  * torch Conv2d  [O, I, kh, kw]      -> flax Conv kernel [kh, kw, I, O]
  * depthwise conv [C, 1, kh, kw]     -> [kh, kw, 1, C]
  * torch Linear  [out, in]           -> flax Dense kernel [in, out]
  * ConvTranspose2d [I, O, kh, kw]    -> flax ConvTranspose [kh, kw, O, I]
                                         (flipped spatially: torch's
                                         transposed conv correlates, flax
                                         convolves)
  * LayerNorm/BN weight/bias          -> scale/bias (+ batch_stats mean/var)
  * PVTv2 per-block tensors           -> stacked [depth, ...] (nn.scan)
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
from flax import traverse_util

__all__ = [
    "convert_gmflow_state",
    "convert_pvt_v2_state",
    "convert_emip_short_state",
    "maybe_load_reference_weights",
]


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(w) -> np.ndarray:
    w = _np(w)
    if w.shape[1] == 1 and w.shape[0] > 1:  # possibly depthwise
        return w.transpose(2, 3, 1, 0)
    return w.transpose(2, 3, 1, 0)


def _conv_t(w) -> np.ndarray:
    """torch ConvTranspose2d weight [I, O, kh, kw] -> flax [kh, kw, I, O].

    flax ``nn.ConvTranspose`` applies the kernel spatially MIRRORED
    relative to torch's ConvTranspose2d; flipping kh/kw makes outputs
    match exactly (verified by tests/test_sam_prompt.py parity through
    the SAM head's output upscaler).
    """
    w = _np(w)
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def _lin(w) -> np.ndarray:
    return _np(w).T


class _Tree:
    """Accumulate (collection, path) -> array, then unflatten."""

    def __init__(self):
        self.params: dict[tuple, np.ndarray] = {}
        self.stats: dict[tuple, np.ndarray] = {}

    def p(self, path: str, value):
        self.params[tuple(path.split("/"))] = value

    def s(self, path: str, value):
        self.stats[tuple(path.split("/"))] = value

    def conv(self, dst: str, sd: dict, src: str, bias: bool = True):
        self.p(f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
        if bias and f"{src}.bias" in sd:
            self.p(f"{dst}/bias", _np(sd[f"{src}.bias"]))

    def conv_t(self, dst: str, sd: dict, src: str):
        self.p(f"{dst}/kernel", _conv_t(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            self.p(f"{dst}/bias", _np(sd[f"{src}.bias"]))

    def dense(self, dst: str, sd: dict, src: str):
        self.p(f"{dst}/kernel", _lin(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            self.p(f"{dst}/bias", _np(sd[f"{src}.bias"]))

    def ln(self, dst: str, sd: dict, src: str):
        self.p(f"{dst}/scale", _np(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            self.p(f"{dst}/bias", _np(sd[f"{src}.bias"]))

    def bn(self, dst: str, sd: dict, src: str):
        self.p(f"{dst}/scale", _np(sd[f"{src}.weight"]))
        self.p(f"{dst}/bias", _np(sd[f"{src}.bias"]))
        self.s(f"{dst}/mean", _np(sd[f"{src}.running_mean"]))
        self.s(f"{dst}/var", _np(sd[f"{src}.running_var"]))

    def convbr(self, dst: str, sd: dict, src: str):
        self.conv(f"{dst}/conv", sd, f"{src}.conv", bias=False)
        self.bn(f"{dst}/bn", sd, f"{src}.bn")

    def dimred(self, dst: str, sd: dict, src: str):
        self.convbr(f"{dst}/reduce0", sd, f"{src}.reduce.0")
        self.convbr(f"{dst}/reduce1", sd, f"{src}.reduce.1")

    def unflatten(self):
        out: dict[str, Any] = {
            "params": traverse_util.unflatten_dict(self.params)
        }
        if self.stats:
            out["batch_stats"] = traverse_util.unflatten_dict(self.stats)
        return out


def _has(sd: dict, prefix: str) -> bool:
    return any(k.startswith(prefix) for k in sd)


# --------------------------------------------------------------- GMFlow


def _gmflow_into(t: _Tree, sd: dict, base: str = "gmflow",
                 num_layers: int = 6):
    bb = f"{base}/backbone"
    t.conv(f"{bb}/conv1", sd, "backbone.conv1", bias=False)
    for L in (1, 2, 3):
        for j in (0, 1):
            blk = f"{bb}/layer{L}_{j}"
            t.conv(f"{blk}/conv1", sd, f"backbone.layer{L}.{j}.conv1",
                   bias=False)
            t.conv(f"{blk}/conv2", sd, f"backbone.layer{L}.{j}.conv2",
                   bias=False)
            ds = f"backbone.layer{L}.{j}.downsample.0"
            if f"{ds}.weight" in sd:
                t.conv(f"{blk}/downsample", sd, ds)
    t.conv(f"{bb}/conv2", sd, "backbone.conv2")
    for name in ("dwconv64", "dwconv96", "dwconv128", "dwconv"):
        if f"backbone.{name}.weight" in sd:
            t.conv(f"{bb}/{name}", sd, f"backbone.{name}")
    for name in ("dwconv_pre", "dwconv_post"):
        if f"backbone.{name}.weight" in sd:
            t.conv(f"{bb}/{name}", sd, f"backbone.{name}", bias=False)

    for i in range(num_layers):
        for half in ("self_attn", "cross_attn_ffn"):
            src = f"transformer.layers.{i}.{half}"
            dst = f"{base}/transformer/layer{i}/{half}"
            for proj in ("q_proj", "k_proj", "v_proj", "merge"):
                t.dense(f"{dst}/{proj}", sd, f"{src}.{proj}")
            t.ln(f"{dst}/norm1", sd, f"{src}.norm1")
            if f"{src}.mlp.0.weight" in sd:
                t.dense(f"{dst}/mlp0", sd, f"{src}.mlp.0")
                t.dense(f"{dst}/mlp2", sd, f"{src}.mlp.2")
                t.ln(f"{dst}/norm2", sd, f"{src}.norm2")
            if f"{src}.adaptor_fc1.weight" in sd:
                t.dense(f"{dst}/adaptor_fc1", sd, f"{src}.adaptor_fc1")
                t.dense(f"{dst}/adaptor_fc2", sd, f"{src}.adaptor_fc2")

    t.dense(f"{base}/feature_flow_attn/q_proj", sd,
            "feature_flow_attn.q_proj")
    t.dense(f"{base}/feature_flow_attn/k_proj", sd,
            "feature_flow_attn.k_proj")
    t.conv(f"{base}/upsampler_conv1", sd, "upsampler.0")
    t.conv(f"{base}/upsampler_conv2", sd, "upsampler.2")


def convert_gmflow_state(sd: dict, num_layers: int = 6) -> dict:
    """Standalone GMFlow state dict (e.g. gmflow_things 'model')."""
    t = _Tree()
    _gmflow_into(t, sd, base="gmflow", num_layers=num_layers)
    out = t.unflatten()
    return dict(
        params=out["params"]["gmflow"],
        batch_stats=out.get("batch_stats", {}).get("gmflow", {}),
    )


# --------------------------------------------------------------- PVTv2


def _pvt_block_tensors(sd: dict, stage: int, j: int, linear: bool):
    """One torch PVTv2 block -> {flax_subpath: array} (unstacked)."""
    src = f"block{stage}.{j}"
    out = {}

    def ln(dst, s):
        out[f"{dst}/scale"] = _np(sd[f"{s}.weight"])
        out[f"{dst}/bias"] = _np(sd[f"{s}.bias"])

    def dense(dst, s):
        out[f"{dst}/kernel"] = _lin(sd[f"{s}.weight"])
        if f"{s}.bias" in sd:
            out[f"{dst}/bias"] = _np(sd[f"{s}.bias"])

    ln("norm1", f"{src}.norm1")
    ln("norm2", f"{src}.norm2")
    dense("attn/q", f"{src}.attn.q")
    dense("attn/kv", f"{src}.attn.kv")
    dense("attn/proj", f"{src}.attn.proj")
    if f"{src}.attn.sr.weight" in sd:
        out["attn/sr/kernel"] = _conv(sd[f"{src}.attn.sr.weight"])
        out["attn/sr/bias"] = _np(sd[f"{src}.attn.sr.bias"])
        ln("attn/norm", f"{src}.attn.norm")
    dense("mlp/fc1", f"{src}.mlp.fc1")
    out["mlp/dwconv/kernel"] = _conv(sd[f"{src}.mlp.dwconv.dwconv.weight"])
    out["mlp/dwconv/bias"] = _np(sd[f"{src}.mlp.dwconv.dwconv.bias"])
    dense("mlp/fc2", f"{src}.mlp.fc2")
    return out


def convert_pvt_v2_state(sd: dict, depths, linear: bool = False) -> dict:
    """PVTv2 torch state dict -> flax params (stage blocks depth-stacked)."""
    t = _Tree()
    for i in range(1, 5):
        t.conv(f"patch_embed{i}/proj", sd, f"patch_embed{i}.proj")
        t.ln(f"patch_embed{i}/norm", sd, f"patch_embed{i}.norm")
        t.ln(f"norm{i}", sd, f"norm{i}")

        per_block = [
            _pvt_block_tensors(sd, i, j, linear) for j in range(depths[i - 1])
        ]
        for key in per_block[0]:
            stacked = np.stack([blk[key] for blk in per_block])
            t.p(f"stage{i}/{key}", stacked)
    return t.unflatten()["params"]


# ------------------------------------------------------------ full model


def _injector_into(t: _Tree, sd: dict, src: str, dst: str):
    base = f"{src}.transformer"
    for n in ("norm1", "norm2", "norm3"):
        t.ln(f"{dst}/{n}", sd, f"{base}.{n}.body")
    t.p(f"{dst}/attn/temperature", _np(sd[f"{base}.attn.temperature"]))
    for conv in ("q", "q_dwconv", "kv", "kv_dwconv", "project_out"):
        t.conv(f"{dst}/attn/{conv}", sd, f"{base}.attn.{conv}", bias=True)
    for conv in ("project_in", "dwconv", "project_out"):
        t.conv(f"{dst}/ffn/{conv}", sd, f"{base}.ffn.{conv}", bias=True)


def _ln2d(t: _Tree, sd: dict, src: str, dst: str):
    t.p(f"{dst}/scale", _np(sd[f"{src}.weight"]))
    t.p(f"{dst}/bias", _np(sd[f"{src}.bias"]))


def normalize_reference_keys(sd: dict) -> dict:
    """Apply the reference's load-time key remaps (train.py:284,312-328)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if "backbone.pvtv2_en" in k and "feat_net" not in k:
            k = k.replace("backbone.pvtv2_en", "backbone.feat_net.pvtv2_en")
        out[k] = v
    return out


def convert_emip_short_state(
    sd: dict, depths=(3, 6, 40, 3), num_layers: int = 6,
    include_dead: bool = True,
) -> dict:
    """Full EMIP (CoUpdater) torch snapshot -> flax variables for EMIPShort."""
    sd = normalize_reference_keys(sd)
    t = _Tree()

    # segmentation backbone
    pvt = {
        k[len("backbone.feat_net.pvtv2_en."):]: v
        for k, v in sd.items()
        if k.startswith("backbone.feat_net.pvtv2_en.")
    }
    if pvt:
        bb = convert_pvt_v2_state(pvt, depths)
        for path, val in traverse_util.flatten_dict(bb).items():
            t.params[("backbone",) + path] = val

    # flow engine
    gm = {k[len("GMFlow."):]: v for k, v in sd.items()
          if k.startswith("GMFlow.")}
    if gm:
        _gmflow_into(t, gm, base="gmflow", num_layers=num_layers)

    # prompt injectors
    if _has(sd, "injector."):
        _injector_into(t, sd, "injector", "injector")
    if _has(sd, "injector1."):
        _injector_into(t, sd, "injector1", "injector1")

    # correlation embedding: Sequential(conv, BN, ReLU, conv)
    if _has(sd, "conv_corr."):
        t.conv("conv_corr_0", sd, "conv_corr.0")
        t.bn("conv_corr_bn", sd, "conv_corr.1")
        t.conv("conv_corr_1", sd, "conv_corr.3")

    # reductions + decoder
    for dr in ("dr1", "dr2", "dr3"):
        if _has(sd, f"{dr}.reduce"):
            t.dimred(dr, sd, dr)
    if _has(sd, "decoder."):
        for name in ("conv_upsample1", "conv_upsample2", "conv_upsample3",
                     "conv_upsample4", "conv_upsample5", "conv_concat2",
                     "conv_concat3", "conv4"):
            t.convbr(f"decoder/{name}", sd, f"decoder.{name}")
        t.conv("decoder/conv5", sd, "decoder.conv5")

    # dead-but-checkpointed modules (model.py:53-84)
    if include_dead:
        if _has(sd, "dr2_new."):
            t.conv("dr2_new", sd, "dr2_new")
        if _has(sd, "dr3_new."):
            t.conv("dr3_new_conv0", sd, "dr3_new.0")
            t.bn("dr3_new_bn0", sd, "dr3_new.1")
            t.conv("dr3_new_conv1", sd, "dr3_new.3")
            t.bn("dr3_new_bn1", sd, "dr3_new.4")
        if _has(sd, "downscaling1."):
            t.conv("downscaling1_conv", sd, "downscaling1.0")
            _ln2d(t, sd, "downscaling1.1", "downscaling1_ln")
        if _has(sd, "upscaling4."):
            t.conv_t("upscaling4_conv0", sd, "upscaling4.0")
            _ln2d(t, sd, "upscaling4.1", "upscaling4_ln")
            t.conv_t("upscaling4_conv1", sd, "upscaling4.3")
        if _has(sd, "upscaling3."):
            t.conv_t("upscaling3_conv", sd, "upscaling3.0")
            _ln2d(t, sd, "upscaling3.1", "upscaling3_ln")

    return t.unflatten()


def convert_emip_long_state(
    sd: dict, depths=(3, 6, 40, 3), num_layers: int = 6,
    include_dead: bool = True,
) -> dict:
    """Full Model_long torch snapshot -> flax variables for EMIPLong.

    Maps the reference module tree of ``model/EMIP_long/model_long.py:52-66``:
    the frozen ``short_term`` CoUpdater (via :func:`convert_emip_short_state`),
    the LTM key/value heads + prompt fusion (``LTM.py:80-92``), and the
    long head (``long_dr`` / ``injector1`` / ``decoder`` / ``dr1``).
    Dead-in-forward LTM members (``fusion.conv1_m``, ``Decoder``,
    ``dr1/dr2/dr3`` — LTM.py:88-92 are never reached on the live path) are
    skipped; ``_merge_into`` reports them as unmatched if present.
    """
    sd = normalize_reference_keys(sd)
    t = _Tree()

    short = {k[len("short_term."):]: v for k, v in sd.items()
             if k.startswith("short_term.")}
    if short:
        conv = convert_emip_short_state(
            short, depths=depths, num_layers=num_layers,
            include_dead=include_dead,
        )
        for path, val in traverse_util.flatten_dict(conv["params"]).items():
            t.params[("short_term",) + path] = val
        for path, val in traverse_util.flatten_dict(
                conv.get("batch_stats", {})).items():
            t.stats[("short_term",) + path] = val

    if _has(sd, "LTM."):
        t.conv("ltm/kv_memory/key", sd, "LTM.KV_M_r4.Key")
        t.conv("ltm/kv_memory/value", sd, "LTM.KV_M_r4.Value")
        t.conv("ltm/kv_query/key", sd, "LTM.KV_Q_r4.Key")
        t.conv("ltm/kv_query/value", sd, "LTM.KV_Q_r4.Value")
        # fusion: Sequential(conv 128->512, BN, ReLU, conv 512->128)
        t.conv("ltm/fuse/expand", sd, "LTM.fusion.conv1_fusion.0")
        t.bn("ltm/fuse/bn", sd, "LTM.fusion.conv1_fusion.1")
        t.conv("ltm/fuse/project", sd, "LTM.fusion.conv1_fusion.3")

    if _has(sd, "long_dr."):
        t.dimred("long_dr", sd, "long_dr")
    if _has(sd, "injector1.transformer"):
        _injector_into(t, sd, "injector1", "injector1")
    if _has(sd, "dr1.reduce"):
        t.dimred("dr1", sd, "dr1")
    if _has(sd, "decoder."):
        for name in ("conv_upsample1", "conv_upsample2", "conv_upsample3",
                     "conv_upsample4", "conv_upsample5", "conv_concat2",
                     "conv_concat3", "conv4"):
            t.convbr(f"decoder/{name}", sd, f"decoder.{name}")
        t.conv("decoder/conv5", sd, "decoder.conv5")

    return t.unflatten()


def _merge_into(variables: dict, converted: dict, scope: tuple = ()) -> dict:
    """Overlay converted leaves onto an initialized variable tree.

    Only paths that exist in ``variables`` are replaced (the reference's
    'filter keys present in the target' behavior, train.py:315-317); shape
    mismatches raise.
    """
    out = {k: dict(traverse_util.flatten_dict(v))
           for k, v in variables.items()}
    skipped = []
    for coll in ("params", "batch_stats"):
        if coll not in converted or coll not in out:
            continue
        for path, val in traverse_util.flatten_dict(converted[coll]).items():
            path = scope + path
            if path in out[coll]:
                cur = out[coll][path]
                if tuple(cur.shape) != tuple(val.shape):
                    raise ValueError(
                        f"shape mismatch at {path}: "
                        f"{cur.shape} vs {val.shape}"
                    )
                out[coll][path] = val.astype(np.asarray(cur).dtype)
            else:
                skipped.append(path)
    result = {k: traverse_util.unflatten_dict(v) for k, v in out.items()}
    if skipped:
        import logging

        logging.getLogger("emip_tpu").info(
            "checkpoint conversion skipped %d unmatched keys", len(skipped)
        )
    return result


def maybe_load_reference_weights(variables: dict, cfg) -> dict:
    """Load cfg.load.{path,flow_path} torch checkpoints if present on disk."""
    load = getattr(cfg, "load", None)
    if load is None:
        return variables

    depths = (3, 6, 40, 3)
    try:
        from emip_tpu.models.pvt_v2 import PVT_V2_VARIANTS

        depths = PVT_V2_VARIANTS[cfg.model.backbone_name].depths
    except KeyError:
        pass

    if load.path and os.path.isfile(load.path):
        import torch

        sd = torch.load(load.path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        converted = convert_emip_short_state(sd, depths=depths)
        variables = _merge_into(variables, converted)

    if load.flow_path and os.path.isfile(load.flow_path):
        import torch

        ck = torch.load(load.flow_path, map_location="cpu",
                        weights_only=False)
        sd = ck.get("model", ck)
        converted = convert_gmflow_state(sd)
        variables = _merge_into(
            variables,
            dict(params={"gmflow": converted["params"]}),
        )
    return variables


def maybe_load_reference_weights_long(variables: dict, cfg) -> dict:
    """Load a torch Model_long snapshot from cfg.load.long_path if present.

    The reference's ``test_long.py:92-100`` loads the published long
    checkpoint with the 'filter keys present in the model' behavior;
    :func:`_merge_into` reproduces that.
    """
    load = getattr(cfg, "load", None)
    long_path = getattr(load, "long_path", None) if load else None
    if not (long_path and os.path.isfile(long_path)):
        return variables
    import torch

    depths = (3, 6, 40, 3)
    try:
        from emip_tpu.models.pvt_v2 import PVT_V2_VARIANTS

        depths = PVT_V2_VARIANTS[cfg.model.backbone_name].depths
    except KeyError:
        pass
    sd = torch.load(long_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    converted = convert_emip_long_state(sd, depths=depths)
    return _merge_into(variables, converted)


def _two_way_attention_into(t: _Tree, sd: dict, src: str, dst: str):
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        t.dense(f"{dst}/{proj}", sd, f"{src}.{proj}")


def convert_sam_prompt_state(sd: dict, depth: int = 2) -> dict:
    """Reference SAM prompt head (PromptInteract/Interact) -> flax params.

    Maps the torch module tree of ``model/EMIP_short/motion/
    PromptInteract.py:12-173`` (TwoWayTransformer layers, random positional
    encoding buffer, transposed-conv upscaler, hypernetwork MLPs, mask
    downscaler, patch embed) onto :mod:`emip_tpu.models.sam_prompt`'s
    layout. ``depth`` is the two-way transformer depth (2 for
    PromptInteract, 1 for Interact).
    """
    t = _Tree()
    if "mask_tokens.weight" in sd:
        t.p("mask_tokens", _np(sd["mask_tokens.weight"]))
    if "motion_tokens" in sd:
        t.p("motion_tokens", _np(sd["motion_tokens"]))
    if "flow_tokens.weight" in sd:
        t.p("flow_tokens", _np(sd["flow_tokens.weight"]))
    t.p("pe_layer/positional_encoding_gaussian_matrix",
        _np(sd["pe_layer.positional_encoding_gaussian_matrix"]))
    t.conv("PatchEmbed/proj", sd, "PatchEmbed.proj")

    for i in range(depth):
        src = f"transformer.layers.{i}"
        dst = f"transformer/layer{i}"
        _two_way_attention_into(t, sd, f"{src}.self_attn",
                                f"{dst}/self_attn")
        _two_way_attention_into(t, sd, f"{src}.cross_attn_token_to_image",
                                f"{dst}/cross_attn_token_to_image")
        _two_way_attention_into(t, sd, f"{src}.cross_attn_image_to_token",
                                f"{dst}/cross_attn_image_to_token")
        for n in ("norm1", "norm2", "norm3", "norm4"):
            t.ln(f"{dst}/{n}", sd, f"{src}.{n}")
        t.dense(f"{dst}/mlp/lin1", sd, f"{src}.mlp.lin1")
        t.dense(f"{dst}/mlp/lin2", sd, f"{src}.mlp.lin2")
    _two_way_attention_into(t, sd, "transformer.final_attn_token_to_image",
                            "transformer/final_attn_token_to_image")
    t.ln("transformer/norm_final_attn", sd, "transformer.norm_final_attn")

    t.conv_t("output_upscaling/deconv0", sd, "output_upscaling.0")
    _ln2d(t, sd, "output_upscaling.1", "output_upscaling/ln")
    t.conv_t("output_upscaling/deconv1", sd, "output_upscaling.3")

    for key in list(sd):
        if key.startswith("output_hypernetworks_mlps."):
            parts = key.split(".")
            i, j = parts[1], parts[3]
            if key.endswith(".weight"):
                t.dense(f"output_hypernetworks_mlps_{i}/layers_{j}", sd,
                        key[: -len(".weight")])
        if key.startswith("flow_head.layers.") and key.endswith(".weight"):
            j = key.split(".")[2]
            t.dense(f"flow_head/layers_{j}", sd, key[: -len(".weight")])

    t.conv("mask_downscaling/conv0", sd, "mask_downscaling.0")
    _ln2d(t, sd, "mask_downscaling.1", "mask_downscaling/ln0")
    t.conv("mask_downscaling/conv1", sd, "mask_downscaling.3")
    _ln2d(t, sd, "mask_downscaling.4", "mask_downscaling/ln1")
    t.conv("mask_downscaling/conv2", sd, "mask_downscaling.6")

    return t.unflatten()["params"]
