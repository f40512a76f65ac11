#!/usr/bin/env python
"""Debug harness for tests/test_grad_parity.py: cache each side's gradients
to disk so the (20-min) two-framework computation runs once and the
comparison can iterate freely.

Usage:
    python tools/debug_grad_parity.py torch   # -> /tmp/gradpar/torch.pt
    python tools/debug_grad_parity.py jax     # -> /tmp/gradpar/jax.npz
    python tools/debug_grad_parity.py compare # prints per-leaf stat table
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

WORK = "/tmp/gradpar"
DEPTHS = (1, 1, 2, 1)
SIZE = 352


def make_batch():
    rng = np.random.default_rng(2)
    img1 = rng.standard_normal((2, 3, SIZE, SIZE)).astype(np.float32)
    img2 = rng.standard_normal((2, 3, SIZE, SIZE)).astype(np.float32)
    gts = (rng.uniform(size=(2, 1, SIZE, SIZE)) > 0.5).astype(np.float32)
    return img1, img2, gts


def run_torch():
    import torch

    from tests.ref_oracle import (
        import_reference,
        make_reduced_b5_factory,
        reference_model_args,
    )

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
            m.drop_prob = 0.0
    model.train()
    for name, p in model.named_parameters():
        if "GMFlow" in name and "dwconv" not in name and "adaptor" not in name:
            p.requires_grad = False

    sd = {k: v.clone() for k, v in model.state_dict().items()}
    img1, img2, gts = make_batch()
    t1, t2, tg = map(torch.from_numpy, (img1, img2, gts))
    preds = model(t1, t2)
    loss_pred = loss_pred_mod.hybrid_e_loss(preds[0], tg)
    pair = torch.cat((t1, t2), dim=1)
    flows = [torch.cat((preds[1][i], preds[2][i]), dim=1)
             for i in range(len(preds[1]))]
    loss_flow = loss_flow_mod.unFlowLoss().compute_loss(flows, pair)
    which = os.environ.get("GRADPAR_LOSS", "both")
    loss = {"both": loss_pred + loss_flow[0], "pred": loss_pred,
            "flow": loss_flow[0]}[which]
    loss.backward()

    grads = {
        name: (p.grad.detach().clone() if p.grad is not None
               else torch.zeros_like(p))
        for name, p in model.named_parameters()
    }
    torch.save(
        {"sd": sd, "grads": grads,
         "losses": [float(loss), float(loss_pred), float(loss_flow[0])]},
        os.path.join(WORK, "torch_%s.pt" % os.environ.get("GRADPAR_LOSS", "both")),
    )
    print("losses", [float(loss), float(loss_pred), float(loss_flow[0])])


def run_jax():
    import torch

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_platforms", "cpu")

    from flax import traverse_util

    from emip_tpu.convert.torch_import import convert_emip_short_state
    from emip_tpu.losses.flow import unsup_flow_loss
    from emip_tpu.losses.seg import hybrid_e_loss
    from emip_tpu.models.backbones import register_backbone
    from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
    from emip_tpu.models.pvt_v2 import PVTv2, PVTv2Config
    from emip_tpu.train.state import (
        GMFLOW_FREEZE,
        merge_params,
        partition_params,
    )

    which = os.environ.get("GRADPAR_LOSS", "both")
    tp = os.path.join(WORK, f"torch_{which}.pt")
    if not os.path.exists(tp):
        tp = os.path.join(WORK, "torch.pt")
    blob = torch.load(tp, weights_only=False)
    sd = blob["sd"]

    # GRADPAR_KERNELS: comma list of kernels left ON among
    # {sr,win,corr,flowattn,convex,splat}; "all" (default) / "none"
    sel = os.environ.get("GRADPAR_KERNELS", "all")
    on = (set("sr,win,corr,flowattn,convex,splat".split(","))
          if sel == "all" else
          set() if sel in ("none", "") else set(sel.split(",")))
    print("kernels ON:", sorted(on))

    pvt_cfg = PVTv2Config(
        depths=DEPTHS, remat=False, drop_path_rate=0.0,
        fused_attn="always" if "sr" in on else "never",
    )
    register_backbone(
        "pvt_v2_b5_reduced_dbg",
        lambda dtype: PVTv2(config=pvt_cfg, dtype=dtype),
        pvt_cfg.embed_dims,
    )
    gm_kw = {}
    if "win" not in on:
        from emip_tpu.models.gmflow.gmflow import GMFlowConfig

        gm_kw["gmflow"] = GMFlowConfig(use_fused_attn=False)
    cfg = EMIPShortConfig(
        backbone_name="pvt_v2_b5_reduced_dbg", inp_size=SIZE, **gm_kw
    )
    model = EMIPShort(config=cfg)

    import functools

    from emip_tpu.models.gmflow import gmflow as gmflow_mod
    from emip_tpu.models.gmflow import matching as matching_mod
    import emip_tpu.ops.pallas as pallas_pkg
    import emip_tpu.ops.pallas.splat as splat_mod

    if "corr" not in on:
        gmflow_mod.global_correlation_softmax = functools.partial(
            matching_mod.global_correlation_softmax, use_pallas=False)
    if "convex" not in on:
        from emip_tpu.ops.pallas import convex_upsample as cu_mod

        gmflow_mod.convex_upsample_pallas = cu_mod._xla_reference
    if "flowattn" not in on:
        def _flowattn_xla(q, k, v):
            c = q.shape[-1]
            scores = jnp.einsum(
                "blc,bmc->blm", q.astype(jnp.float32),
                k.astype(jnp.float32)) / (c**0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            return jnp.einsum("blm,bmd->bld", probs,
                              v.astype(jnp.float32))

        pallas_pkg.fused_flow_attention = _flowattn_xla
    if "splat" not in on:
        splat_mod.splat_density_pallas = splat_mod._xla_reference

    variables = convert_emip_short_state(sd, depths=DEPTHS)
    img1, img2, gts = make_batch()
    j1 = jnp.asarray(np.transpose(img1, (0, 2, 3, 1)))
    j2 = jnp.asarray(np.transpose(img2, (0, 2, 3, 1)))
    jg = jnp.asarray(np.transpose(gts, (0, 2, 3, 1)))

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
        total = {"both": lp + lf, "pred": lp, "flow": lf}[which]
        return total, (lp, lf)

    (loss, (lp, lf)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(trainable)
    print("jax losses", float(loss), float(lp), float(lf))

    flat = {"/".join(k): np.asarray(v)
            for k, v in traverse_util.flatten_dict(grads).items()}
    tag = (os.environ.get("GRADPAR_KERNELS", "all").replace(",", "-") or "none")
    tag += "_" + which
    np.savez(os.path.join(WORK, f"jax_{tag}.npz"),
             **flat, __losses=np.asarray([float(loss), float(lp), float(lf)]))


def torch_lossgrad():
    """Grad of the torch loss w.r.t. the model OUTPUTS (mask + flows)."""
    import torch

    from tests.ref_oracle import import_reference

    blob = torch.load(os.path.join(WORK, "torch.pt"), weights_only=False)

    # re-run the forward to get preds (cheap enough) with retain_grad
    from tests.ref_oracle import (
        make_reduced_b5_factory,
        reference_model_args,
    )

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
    model.load_state_dict(blob["sd"])
    for m in model.modules():
        if type(m).__name__ == "DropPath":
            m.drop_prob = 0.0
    model.train()

    img1, img2, gts = make_batch()
    t1, t2, tg = map(torch.from_numpy, (img1, img2, gts))
    preds = model(t1, t2)
    mask = preds[0]
    flows_fw = list(preds[1])
    flows_bw = list(preds[2])
    for t in [mask] + flows_fw + flows_bw:
        t.retain_grad()

    loss_pred = loss_pred_mod.hybrid_e_loss(mask, tg)
    pair = torch.cat((t1, t2), dim=1)
    flows = [torch.cat((flows_fw[i], flows_bw[i]), dim=1)
             for i in range(len(flows_fw))]
    loss_flow = loss_flow_mod.unFlowLoss().compute_loss(flows, pair)
    loss = loss_pred + loss_flow[0]
    loss.backward()

    out = {"mask": mask.detach().numpy(),
           "gmask": mask.grad.detach().numpy()}
    for i, (f, b) in enumerate(zip(flows_fw, flows_bw)):
        out[f"fw{i}"] = f.detach().numpy()
        out[f"bw{i}"] = b.detach().numpy()
        out[f"gfw{i}"] = f.grad.detach().numpy()
        out[f"gbw{i}"] = b.grad.detach().numpy()
    out["n_levels"] = np.asarray(len(flows_fw))
    np.savez(os.path.join(WORK, "lossgrad_torch.npz"), **out)
    print("saved lossgrad_torch.npz; loss", float(loss))


def jax_lossgrad():
    """Our loss grads w.r.t. the SAME (torch-produced) outputs; compare."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_platforms", "cpu")

    from emip_tpu.losses.flow import unsup_flow_loss
    from emip_tpu.losses.seg import hybrid_e_loss

    z = np.load(os.path.join(WORK, "lossgrad_torch.npz"))
    n = int(z["n_levels"])
    img1, img2, gts = make_batch()
    j1 = jnp.asarray(np.transpose(img1, (0, 2, 3, 1)))
    j2 = jnp.asarray(np.transpose(img2, (0, 2, 3, 1)))
    jg = jnp.asarray(np.transpose(gts, (0, 2, 3, 1)))

    def to_nhwc(a):
        return jnp.asarray(np.transpose(a, (0, 2, 3, 1)))

    mask = to_nhwc(z["mask"])
    fws = [to_nhwc(z[f"fw{i}"]) for i in range(n)]
    bws = [to_nhwc(z[f"bw{i}"]) for i in range(n)]

    def loss_fn(mask, fws, bws):
        lp = hybrid_e_loss(mask, jg)
        lf, _, _ = unsup_flow_loss(list(zip(fws, bws)), j1, j2)
        return lp + lf

    loss, (gmask, gfws, gbws) = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2))(mask, fws, bws)
    print("jax loss", float(loss))

    def stat(name, got, want_nchw):
        want = np.transpose(want_nchw, (0, 2, 3, 1))
        got = np.asarray(got, np.float64)
        d = np.abs(got - want).max()
        print(f"{name:10s} |torch|max {np.abs(want).max():10.3e} "
              f"maxdiff {d:10.3e} rel {d / max(np.abs(want).max(), 1e-12):8.4f}")

    stat("gmask", gmask, z["gmask"])
    for i in range(n):
        stat(f"gfw{i}", gfws[i], z[f"gfw{i}"])
        stat(f"gbw{i}", gbws[i], z[f"gbw{i}"])


def torch_flowsplit():
    """Flow-loss-only backward: grads at (a, b) injected features + params."""
    import torch

    from tests.ref_oracle import (
        import_reference,
        make_reduced_b5_factory,
        reference_model_args,
    )

    blob = torch.load(os.path.join(WORK, "torch.pt"), weights_only=False)
    model_mod = import_reference("model.EMIP_short.model")
    loss_flow_mod = import_reference("loss.loss_flow")
    pvt_v2, factory = make_reduced_b5_factory(DEPTHS)
    orig = pvt_v2.pvt_v2_b5
    pvt_v2.pvt_v2_b5 = factory
    try:
        torch.manual_seed(0)
        model = model_mod.CoUpdater(reference_model_args())
    finally:
        pvt_v2.pvt_v2_b5 = orig
    model.load_state_dict(blob["sd"])
    for m in model.modules():
        if type(m).__name__ == "DropPath":
            m.drop_prob = 0.0
    model.train()
    for name, p in model.named_parameters():
        if "GMFlow" in name and "dwconv" not in name and "adaptor" not in name:
            p.requires_grad = False

    captured = []
    model.injector.register_forward_hook(
        lambda m, i, o: captured.append(o))

    img1, img2, gts = make_batch()
    t1, t2, _ = map(torch.from_numpy, (img1, img2, gts))
    preds = model(t1, t2)
    a, b = captured
    a.retain_grad(), b.retain_grad()

    pair = torch.cat((t1, t2), dim=1)
    flows = [torch.cat((preds[1][i], preds[2][i]), dim=1)
             for i in range(len(preds[1]))]
    lf = loss_flow_mod.unFlowLoss().compute_loss(flows, pair)[0]
    lf.backward(retain_graph=True)
    out = {"a": a.detach().numpy(), "b": b.detach().numpy(),
           "ga": a.grad.detach().numpy(), "gb": b.grad.detach().numpy(),
           "lf": np.float64(float(lf))}
    for i in range(len(preds[1])):
        out[f"fw{i}"] = preds[1][i].detach().numpy()
        out[f"bw{i}"] = preds[2][i].detach().numpy()
    out["n_levels"] = np.asarray(len(preds[1]))

    # fixed-cotangent engine VJP: pull the saved full-loss cotangents (from
    # lossgrad_torch.npz — identical constants on both sides) through
    # d flows / d (a, b)
    lz = np.load(os.path.join(WORK, "lossgrad_torch.npz"))
    cots = ([torch.from_numpy(lz[f"gfw{i}"]) for i in range(len(preds[1]))]
            + [torch.from_numpy(lz[f"gbw{i}"]) for i in range(len(preds[2]))])
    ga_f, gb_f = torch.autograd.grad(
        list(preds[1]) + list(preds[2]), [a, b], grad_outputs=cots)
    out["ga_fixed"] = ga_f.detach().numpy()
    out["gb_fixed"] = gb_f.detach().numpy()
    np.savez(os.path.join(WORK, "flowsplit_torch.npz"), **out)
    grads = {
        name: (p.grad.detach().clone() if p.grad is not None
               else torch.zeros_like(p))
        for name, p in model.named_parameters()
    }
    torch.save(grads, os.path.join(WORK, "flowsplit_torch_params.pt"))
    print("lf", float(lf))


def jax_flowsplit():
    """Our flow-loss grads w.r.t. the SAME (a, b) through gmflow only."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_platforms", "cpu")

    import torch

    from emip_tpu.convert.torch_import import convert_emip_short_state
    from emip_tpu.losses.flow import unsup_flow_loss
    from emip_tpu.models.backbones import register_backbone
    from emip_tpu.models.emip_short import EMIPShort, EMIPShortConfig
    from emip_tpu.models.pvt_v2 import PVTv2, PVTv2Config

    blob = torch.load(os.path.join(WORK, "torch.pt"), weights_only=False)
    sel = os.environ.get("GRADPAR_KERNELS", "none")
    on = (set("sr,win,corr,flowattn,convex,splat".split(","))
          if sel == "all" else
          set() if sel in ("none", "") else set(sel.split(",")))
    print("kernels ON:", sorted(on))

    pvt_cfg = PVTv2Config(depths=DEPTHS, remat=False, drop_path_rate=0.0,
                          fused_attn="never")
    register_backbone(
        "pvt_v2_b5_reduced_fs",
        lambda dtype: PVTv2(config=pvt_cfg, dtype=dtype),
        pvt_cfg.embed_dims,
    )
    gm_kw = {}
    if "win" not in on:
        from emip_tpu.models.gmflow.gmflow import GMFlowConfig

        gm_kw["gmflow"] = GMFlowConfig(use_fused_attn=False)
    model = EMIPShort(config=EMIPShortConfig(
        backbone_name="pvt_v2_b5_reduced_fs", inp_size=SIZE, **gm_kw))

    import functools

    from emip_tpu.models.gmflow import gmflow as gmflow_mod
    from emip_tpu.models.gmflow import matching as matching_mod
    import emip_tpu.ops.pallas as pallas_pkg
    import emip_tpu.ops.pallas.splat as splat_mod

    if "corr" not in on:
        gmflow_mod.global_correlation_softmax = functools.partial(
            matching_mod.global_correlation_softmax, use_pallas=False)
    if "convex" not in on:
        from emip_tpu.ops.pallas import convex_upsample as cu_mod

        gmflow_mod.convex_upsample_pallas = cu_mod._xla_reference
    if "flowattn" not in on:
        def _flowattn_xla(q, k, v):
            c = q.shape[-1]
            scores = jnp.einsum("blc,bmc->blm", q.astype(jnp.float32),
                                k.astype(jnp.float32)) / (c**0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            return jnp.einsum("blm,bmd->bld", probs, v.astype(jnp.float32))

        pallas_pkg.fused_flow_attention = _flowattn_xla
    if "splat" not in on:
        splat_mod.splat_density_pallas = splat_mod._xla_reference

    variables = convert_emip_short_state(blob["sd"], depths=DEPTHS)
    z = np.load(os.path.join(WORK, "flowsplit_torch.npz"))
    a = jnp.asarray(np.transpose(z["a"], (0, 2, 3, 1)))
    b = jnp.asarray(np.transpose(z["b"], (0, 2, 3, 1)))

    img1, img2, _ = make_batch()
    j1 = jnp.asarray(np.transpose(img1, (0, 2, 3, 1)))
    j2 = jnp.asarray(np.transpose(img2, (0, 2, 3, 1)))

    def engine(self, a, b):
        return self.gmflow([a], [b], training=True)

    def loss_fn(a, b):
        flow_fw, flow_bw, _ = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            a, b, method=engine,
        )
        lf, _, _ = unsup_flow_loss(list(zip(flow_fw, flow_bw)), j1, j2)
        return lf

    lf, (ga, gb) = jax.value_and_grad(loss_fn, argnums=(0, 1))(a, b)
    print("jax lf", float(lf), " torch lf", float(z["lf"]))

    def stat(name, got, want_nchw):
        want = np.transpose(want_nchw, (0, 2, 3, 1)).astype(np.float64)
        got = np.asarray(got, np.float64)
        d = np.abs(got - want)
        scale = max(np.abs(want).max(), 1e-12)
        print(f"{name:10s} |t|max {scale:.3e} maxdiff {d.max():.3e} "
              f"relmax {d.max() / scale:.4f} "
              f"relrms {np.sqrt((d**2).mean()) / np.sqrt((want**2).mean()):.5f}")

    stat("ga", ga, z["ga"])
    stat("gb", gb, z["gb"])

    # engine FORWARD parity from identical (a, b)
    def engine_fwd(a, b):
        return model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            a, b, method=engine,
        )

    fw, bw, _ = engine_fwd(a, b)
    n = int(z["n_levels"])
    for i in range(n):
        stat(f"fwd fw{i}", fw[i], z[f"fw{i}"])
        stat(f"fwd bw{i}", bw[i], z[f"bw{i}"])

    # fixed-cotangent VJP: identical cotangents on both sides
    lz = np.load(os.path.join(WORK, "lossgrad_torch.npz"))

    def flows_fn(a, b):
        fw, bw, _ = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            a, b, method=engine,
        )
        return list(fw), list(bw)

    _, vjp = jax.vjp(flows_fn, a, b)
    cots = (
        [jnp.asarray(np.transpose(lz[f"gfw{i}"], (0, 2, 3, 1)))
         for i in range(n)],
        [jnp.asarray(np.transpose(lz[f"gbw{i}"], (0, 2, 3, 1)))
         for i in range(n)],
    )
    ga_f, gb_f = vjp(cots)
    stat("ga_fixed", ga_f, z["ga_fixed"])
    stat("gb_fixed", gb_f, z["gb_fixed"])

    np.savez(os.path.join(WORK, f"flowsplit_jax_{sel}.npz"),
             ga=np.asarray(ga), gb=np.asarray(gb),
             ga_fixed=np.asarray(ga_f), gb_fixed=np.asarray(gb_f))


def compare():
    import torch

    from flax import traverse_util

    from emip_tpu.convert.torch_import import convert_emip_short_state
    from emip_tpu.train.state import GMFLOW_FREEZE, partition_params

    which = os.environ.get("GRADPAR_LOSS", "both")
    tp = os.path.join(WORK, f"torch_{which}.pt")
    if not os.path.exists(tp):
        tp = os.path.join(WORK, "torch.pt")
    blob = torch.load(tp, weights_only=False)
    sd, tg = blob["sd"], blob["grads"]
    tag = (sys.argv[2] if len(sys.argv) > 2
           else os.environ.get("GRADPAR_KERNELS", "all").replace(",", "-"))
    jz = np.load(os.path.join(WORK, f"jax_{tag}.npz"))
    print("comparing jax_%s.npz" % tag)
    print("torch losses", blob["losses"], " jax losses",
          list(jz["__losses"]))

    gsd = dict(sd)
    gsd.update(tg)
    ref_tree = convert_emip_short_state(gsd, depths=DEPTHS)
    ref_trainable, _ = partition_params(ref_tree["params"], GMFLOW_FREEZE)
    want = {"/".join(k): np.asarray(v, np.float64)
            for k, v in traverse_util.flatten_dict(ref_trainable).items()}

    rows = []
    for k in sorted(want):
        w = want[k]
        g = np.asarray(jz[k], np.float64)
        diff = np.abs(g - w).max()
        rows.append((k, float(np.abs(w).max()), float(np.abs(g).max()),
                     float(diff),
                     float(diff / max(np.abs(w).max(), 1e-12))))
    rows.sort(key=lambda r: -r[3])
    print(f"{'leaf':60s} {'|torch|max':>11s} {'|jax|max':>11s} "
          f"{'maxdiff':>11s} {'rel':>9s}")
    for r in rows[:50]:
        print(f"{r[0][:60]:60s} {r[1]:11.3e} {r[2]:11.3e} "
              f"{r[3]:11.3e} {r[4]:9.3f}")
    # global scale
    gmax = max(r[1] for r in rows)
    print(f"\nglobal max|torch grad| = {gmax:.3e}")
    bad = [r for r in rows if r[3] > 1e-3 * max(r[1], 1e-8)]
    print(f"leaves with maxdiff > 1e-3*scale: {len(bad)}/{len(rows)}")


if __name__ == "__main__":
    os.makedirs(WORK, exist_ok=True)
    {"torch": run_torch, "jax": run_jax, "compare": compare,
     "torch_lossgrad": torch_lossgrad, "torch_flowsplit": torch_flowsplit,
     "jax_flowsplit": jax_flowsplit,
     "jax_lossgrad": jax_lossgrad}[sys.argv[1]]()
