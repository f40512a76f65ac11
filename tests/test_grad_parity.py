"""Gradient-level oracle parity vs torch autograd on the reference.

Closes the round-2 verification gap ("forward parity + our own bwd oracles"
-> "trains the same"): the *reference's own code* (model/EMIP_short/
model.py:86-102, loss/loss_pred.py:4-22, loss/loss_flow.py:16-138, loss
assembly train.py:52-58) runs on CPU from one set of weights, and its
autograd gradients are compared against ``jax.grad`` with the fused Pallas
kernels ON (interpreter mode on CPU): flow-engine window attention,
corr-softmax expectation, flow attention, convex upsample, splat, and the
PVT SR-attention kernel.

Why the comparison is FACTORED instead of one full-chain diff: the
unsupervised flow loss's gradient w.r.t. flow is piecewise-constant in the
warp coordinates (bilinear corner weights jump at integer crossings), so it
is discontinuous in the flow. Measured conditioning (tools/
debug_grad_parity.py): a 0.03-pixel flow perturbation — the same order as
the unavoidable cross-framework forward jitter — changes that gradient by
~50% RMS *within one framework*. A naive end-to-end grad comparison through
the flow loss therefore bounds nothing. Instead, each factor is compared
where it is well-conditioned; together they cover the entire training
gradient:

1. loss VALUES (fp32 forward through both losses) — rel ~1e-6;
2. segmentation-loss param gradients through the FULL model (hybrid-E is
   smooth; the path exercises decoder, injectors, conv_corr, the
   correlation volume, the whole flow transformer and both backbones'
   backward) — per-leaf relmax ~1e-2, measured;
3. flow-loss gradients w.r.t. the flow predictions at IDENTICAL flow
   inputs (covers warp/occlusion/SSIM backward) — relmax <= 1e-2 measured;
4. flow-engine VJP with IDENTICAL output cotangents, kernels ON (covers
   every custom-VJP kernel backward against torch autograd) — relmax
   <= 1e-3 measured.

Setup notes: train-mode forward on both sides (BatchNorm batch statistics
ARE differentiated through); drop-path forced to 0 for determinism; freeze
rule as in reference train.py:340-342.
"""

import numpy as np
import pytest

from tests.ref_oracle import (
    has_reference,
    import_reference,
    make_reduced_b5_factory,
    reference_model_args,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]

DEPTHS = (1, 1, 2, 1)
SIZE = 352  # the reference hardcodes 44*44 glue (model.py:59); 352 only

# max |jax - torch| / max|torch| within each leaf/tensor, with margin over
# measured values (tools/debug_grad_parity.py round-3 session):
SEG_GRAD_RTOL = 8e-2        # measured worst leaf 0.030, typical <= 0.01
LOSSGRAD_RTOL = 3e-2        # measured worst level 0.0073
ENGINE_VJP_RTOL = 5e-3      # measured worst 0.0009 (kernels ON)
LOSS_VALUE_RTOL = 2e-4


def _make_batch():
    rng = np.random.default_rng(2)
    img1 = rng.standard_normal((2, 3, SIZE, SIZE)).astype(np.float32)
    img2 = rng.standard_normal((2, 3, SIZE, SIZE)).astype(np.float32)
    gts = (rng.uniform(size=(2, 1, SIZE, SIZE)) > 0.5).astype(np.float32)
    return img1, img2, gts


@pytest.fixture(scope="module")
def torch_side():
    """One reference forward + the three backward quantities to match."""
    import torch

    model_mod = import_reference("model.EMIP_short.model")
    loss_pred_mod = import_reference("loss.loss_pred")
    loss_flow_mod = import_reference("loss.loss_flow")

    pvt_v2, factory = make_reduced_b5_factory(DEPTHS)
    orig = pvt_v2.pvt_v2_b5
    pvt_v2.pvt_v2_b5 = factory
    try:
        torch.manual_seed(0)
        model = model_mod.CoUpdater(reference_model_args())
    finally:
        pvt_v2.pvt_v2_b5 = orig

    # randomize stats/temperatures that default to identity-ish values so
    # the comparison exercises them (as in test_full_model_parity)
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0.0, 0.2, generator=gen)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5, generator=gen)
        for name, p in model.named_parameters():
            if name.endswith("temperature"):
                p.uniform_(0.5, 1.5, generator=gen)

    for m in model.modules():
        if type(m).__name__ == "DropPath":
            m.drop_prob = 0.0  # deterministic train mode
    model.train()
    for name, p in model.named_parameters():
        if "GMFlow" in name and "dwconv" not in name and "adaptor" not in name:
            p.requires_grad = False  # reference freeze rule (train.py:340-342)

    sd = {k: v.clone() for k, v in model.state_dict().items()}

    captured = []
    model.injector.register_forward_hook(lambda m, i, o: captured.append(o))

    img1, img2, gts = _make_batch()
    t1, t2, tg = map(torch.from_numpy, (img1, img2, gts))
    preds = model(t1, t2)
    a, b = captured
    mask, flows_fw, flows_bw = preds[0], list(preds[1]), list(preds[2])

    loss_pred = loss_pred_mod.hybrid_e_loss(mask, tg)
    pair = torch.cat((t1, t2), dim=1)
    flow_pair = [torch.cat((f, g), dim=1)
                 for f, g in zip(flows_fw, flows_bw)]
    loss_flow = loss_flow_mod.unFlowLoss().compute_loss(flow_pair, pair)[0]

    # (2) seg-loss param grads through the full model
    seg_grads_t = torch.autograd.grad(
        loss_pred,
        [p for p in model.parameters() if p.requires_grad],
        retain_graph=True, allow_unused=True,
    )
    named_trainable = [n for n, p in model.named_parameters()
                      if p.requires_grad]
    seg_grads = {}
    for n, p, g in zip(named_trainable,
                       (p for p in model.parameters() if p.requires_grad),
                       seg_grads_t):
        seg_grads[n] = (g if g is not None else torch.zeros_like(p)).clone()

    # (3) flow-loss grads w.r.t. the flow predictions
    flow_cots = torch.autograd.grad(
        loss_flow, flows_fw + flows_bw, retain_graph=True)

    # (4) engine VJP: pull those cotangents back to the injected features
    ga, gb = torch.autograd.grad(
        flows_fw + flows_bw, [a, b], grad_outputs=flow_cots)

    n = len(flows_fw)
    return dict(
        sd=sd,
        losses=(float(loss_pred), float(loss_flow)),
        n_levels=n,
        a=a.detach().numpy(), b=b.detach().numpy(),
        flows_fw=[f.detach().numpy() for f in flows_fw],
        flows_bw=[f.detach().numpy() for f in flows_bw],
        flow_cots=[c.detach().numpy() for c in flow_cots],
        ga=ga.detach().numpy(), gb=gb.detach().numpy(),
        seg_grads=seg_grads,
    )


@pytest.fixture(scope="module")
def jax_model(torch_side):
    import jax.numpy as jnp

    from emip_tpu.convert.torch_import import convert_emip_short_state
    from emip_tpu.models.backbones import register_backbone
    from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
    from emip_tpu.models.pvt_v2 import PVTv2, PVTv2Config

    pvt_cfg = PVTv2Config(
        depths=DEPTHS, remat=False, drop_path_rate=0.0, fused_attn="always"
    )
    register_backbone(
        "pvt_v2_b5_reduced_grad",
        lambda dtype: PVTv2(config=pvt_cfg, dtype=dtype),
        pvt_cfg.embed_dims,
    )
    model = EMIPShort(config=EMIPShortConfig(
        backbone_name="pvt_v2_b5_reduced_grad", inp_size=SIZE))
    variables = convert_emip_short_state(torch_side["sd"], depths=DEPTHS)

    img1, img2, gts = _make_batch()
    j1 = jnp.asarray(np.transpose(img1, (0, 2, 3, 1)))
    j2 = jnp.asarray(np.transpose(img2, (0, 2, 3, 1)))
    jg = jnp.asarray(np.transpose(gts, (0, 2, 3, 1)))
    return model, variables, (j1, j2, jg)


def _nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


def _relmax(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return np.abs(got - want).max() / max(np.abs(want).max(), 1e-12)


def test_loss_values_and_seg_grad_parity(torch_side, jax_model):
    """(1) loss values + (2) seg-loss param grads, fused kernels ON."""
    import jax

    from flax import traverse_util

    from emip_tpu.convert.torch_import import convert_emip_short_state
    from emip_tpu.losses.flow import unsup_flow_loss
    from emip_tpu.losses.seg import hybrid_e_loss
    from emip_tpu.train.state import (
        GMFLOW_FREEZE,
        merge_params,
        partition_params,
    )

    model, variables, (j1, j2, jg) = jax_model
    trainable, frozen = partition_params(variables["params"], GMFLOW_FREEZE)

    def loss_fn(trainable):
        params = merge_params(trainable, frozen)
        (mask, flow_fw, flow_bw), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            j1, j2, train=True,
            rngs={"droppath": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        lp = hybrid_e_loss(mask, jg)
        lf, _, _ = unsup_flow_loss(list(zip(flow_fw, flow_bw)), j1, j2)
        return lp, lf

    (lp, lf), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)

    ref_lp, ref_lf = torch_side["losses"]
    np.testing.assert_allclose(float(lp), ref_lp, rtol=LOSS_VALUE_RTOL)
    np.testing.assert_allclose(float(lf), ref_lf, rtol=LOSS_VALUE_RTOL)

    # convert torch seg-grads through the (linear) weight layout mapping:
    # grads substitute params, buffers ride along and are ignored
    gsd = dict(torch_side["sd"])
    gsd.update(torch_side["seg_grads"])
    ref_tree = convert_emip_short_state(gsd, depths=DEPTHS)
    ref_trainable, _ = partition_params(ref_tree["params"], GMFLOW_FREEZE)

    got = traverse_util.flatten_dict(grads)
    want = traverse_util.flatten_dict(ref_trainable)
    assert set(got) == set(want)

    # scale floor: a leaf whose gradient is mathematically zero (e.g. the
    # conv bias feeding BatchNorm — BN is shift-invariant) is fp noise
    # ~1e-13 on BOTH sides; don't divide noise by noise
    global_scale = max(
        np.abs(np.asarray(v, np.float64)).max() for v in want.values()
    )
    floor = 1e-6 * global_scale

    failures = []
    for key in sorted(want):
        w = np.asarray(want[key], np.float64)
        g = np.asarray(got[key], np.float64)
        rel = np.abs(g - w).max() / max(np.abs(w).max(), floor)
        if rel > SEG_GRAD_RTOL:
            failures.append(("/".join(key), float(rel)))
    assert not failures, (
        f"{len(failures)}/{len(want)} leaves above {SEG_GRAD_RTOL}; worst: "
        + str(sorted(failures, key=lambda t: -t[1])[:8])
    )


def test_flow_loss_grad_parity(torch_side, jax_model):
    """(3) flow-loss gradient w.r.t. flows at IDENTICAL flow inputs."""
    import jax
    import jax.numpy as jnp

    from emip_tpu.losses.flow import unsup_flow_loss

    _, _, (j1, j2, _) = jax_model
    n = torch_side["n_levels"]
    fws = [jnp.asarray(_nhwc(f)) for f in torch_side["flows_fw"]]
    bws = [jnp.asarray(_nhwc(f)) for f in torch_side["flows_bw"]]

    def loss_fn(fws, bws):
        lf, _, _ = unsup_flow_loss(list(zip(fws, bws)), j1, j2)
        return lf

    lf, (gf, gb) = jax.value_and_grad(loss_fn, argnums=(0, 1))(fws, bws)
    np.testing.assert_allclose(
        float(lf), torch_side["losses"][1], rtol=LOSS_VALUE_RTOL)

    cots = torch_side["flow_cots"]
    for i in range(n):
        assert _relmax(gf[i], _nhwc(cots[i])) <= LOSSGRAD_RTOL, f"fw{i}"
        assert _relmax(gb[i], _nhwc(cots[n + i])) <= LOSSGRAD_RTOL, f"bw{i}"


def test_engine_vjp_parity(torch_side, jax_model):
    """(4) flow-engine VJP with identical cotangents, kernels ON.

    This is the direct torch-autograd check of every custom-VJP Pallas
    kernel backward on the flow path (window/block attention with the
    A&S erf, corr-softmax expectation, flow attention, convex upsample).
    """
    import jax
    import jax.numpy as jnp

    model, variables, _ = jax_model
    n = torch_side["n_levels"]
    a = jnp.asarray(_nhwc(torch_side["a"]))
    b = jnp.asarray(_nhwc(torch_side["b"]))

    def engine(self, a, b):
        return self.gmflow([a], [b], training=True)

    # engine forward from identical (a, b) must track torch tightly
    fw, bw, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        a, b, method=engine,
    )
    for i in range(n):
        assert _relmax(fw[i], _nhwc(torch_side["flows_fw"][i])) <= 1e-3
        assert _relmax(bw[i], _nhwc(torch_side["flows_bw"][i])) <= 1e-3

    def flows_fn(a, b):
        fw, bw, _ = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            a, b, method=engine,
        )
        return list(fw), list(bw)

    _, vjp = jax.vjp(flows_fn, a, b)
    cots = torch_side["flow_cots"]
    ga, gb = vjp((
        [jnp.asarray(_nhwc(cots[i])) for i in range(n)],
        [jnp.asarray(_nhwc(cots[n + i])) for i in range(n)],
    ))
    assert _relmax(ga, _nhwc(torch_side["ga"])) <= ENGINE_VJP_RTOL
    assert _relmax(gb, _nhwc(torch_side["gb"])) <= ENGINE_VJP_RTOL
