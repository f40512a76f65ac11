"""Long-model oracle parity: reference Model_long (torch) vs EMIPLong (JAX).

Extends the whole-model parity statement to the long-term architecture
(model/EMIP_long/model_long.py:52-117): frozen short-term feature reuse,
LTM memorize/read (fusion + key/value heads + time-space softmax read,
LTM.py:80-132), memory concat-and-cap streaming semantics, and the long
decode head (long_dr / injector1 / dr1 / decoder). Three frames are
streamed so the reference hits its index==0 (short mask), index==1 (fresh
memory) and index>=2 (memory concat) branches; the converted-checkpoint
masks must match at every step.
"""

import numpy as np
import pytest

from tests.ref_oracle import (
    has_reference,
    import_reference,
    make_reduced_b5_factory,
    reference_model_args,
)

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference not mounted"
)

DEPTHS = (1, 1, 2, 1)
SIZE = 352  # the reference hardcodes 44*44 glue (model.py:59); 352 only


@pytest.fixture(scope="module")
def oracle():
    import torch

    mod = import_reference("model.EMIP_long.model_long")
    pvt_v2, factory = make_reduced_b5_factory(DEPTHS)
    orig = pvt_v2.pvt_v2_b5
    pvt_v2.pvt_v2_b5 = factory
    try:
        torch.manual_seed(0)
        model = mod.Model_long(reference_model_args())
    finally:
        pvt_v2.pvt_v2_b5 = orig
    model.eval()

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
    return model


@pytest.fixture(scope="module")
def converted(oracle):
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from emip_tpu.convert.torch_import import convert_emip_long_state
    from emip_tpu.models.backbones import register_backbone
    from emip_tpu.models.emip_long import EMIPLong
    from emip_tpu.models.emip_short import EMIPShortConfig
    from emip_tpu.models.pvt_v2 import PVTv2, PVTv2Config

    pvt_cfg = PVTv2Config(depths=DEPTHS, remat=False)
    register_backbone(
        "pvt_v2_b5_reduced_long",
        lambda dtype: PVTv2(config=pvt_cfg, dtype=dtype),
        pvt_cfg.embed_dims,
    )
    cfg = EMIPShortConfig(backbone_name="pvt_v2_b5_reduced_long",
                          inp_size=SIZE)
    model = EMIPLong(config=cfg, memory_size=5)

    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img,
                           model.init_memory(1), False)

    conv = convert_emip_long_state(oracle.state_dict(), depths=DEPTHS)

    for coll in ("params", "batch_stats"):
        want = traverse_util.flatten_dict(variables[coll])
        got = traverse_util.flatten_dict(conv[coll])
        assert set(want) == set(got), (
            coll,
            sorted(set(want) - set(got))[:6],
            sorted(set(got) - set(want))[:6],
        )
        for k in want:
            assert want[k].shape == got[k].shape, (
                coll, k, want[k].shape, got[k].shape,
            )
    return model, conv


def test_long_model_parity(oracle, converted):
    import torch

    model, variables = converted

    rng = np.random.default_rng(3)
    frames = rng.standard_normal((3, 3, SIZE, SIZE)).astype(np.float32)
    f = [torch.from_numpy(frames[i]) for i in range(3)]

    with torch.no_grad():
        ref_mask0, _, _ = oracle(f[0], f[1], 0, None, None)
        ref_mask1, mk, mv = oracle(f[0], f[1], 1, None, None)
        ref_mask2, mk, mv = oracle(f[1], f[2], 2, mk, mv)

    jx = np.transpose(frames, (0, 2, 3, 1))[:, None]  # [T, 1, H, W, 3]
    state = model.init_memory(1)
    mask1, short0, state = model.apply(
        variables, jx[0], jx[1], state, False, method="step")
    mask2, _, state = model.apply(
        variables, jx[1], jx[2], state, False, method="step")

    # index==0: the reference returns the short-term mask of (f0, f1)
    np.testing.assert_allclose(
        np.transpose(np.asarray(short0), (0, 3, 1, 2)),
        ref_mask0.numpy(), rtol=1e-3, atol=1e-2,
    )
    # index==1: long head reading a single-slot memory of frame 0
    np.testing.assert_allclose(
        np.transpose(np.asarray(mask1), (0, 3, 1, 2)),
        ref_mask1.numpy(), rtol=1e-3, atol=1e-2,
    )
    # index==2: memory concat (frames 0 and 1 both in the buffer)
    np.testing.assert_allclose(
        np.transpose(np.asarray(mask2), (0, 3, 1, 2)),
        ref_mask2.numpy(), rtol=1e-3, atol=1e-2,
    )
    # the rolling buffer must hold exactly the two reference memory slots
    assert int(np.asarray(state.valid).sum()) == int(mk.shape[3])


def test_long_train_grad_parity(oracle, converted):
    """Long-trainer gradient parity: torch autograd through Model_long's
    index>=2 step (hybrid_e_loss on the long mask, memory detached —
    reference train_long.py:47-58) vs jax.grad over EMIPLong.step's
    trainable subtree (LTM + long head), from identical converted weights
    and an identical one-slot memory."""
    import jax
    import torch
    from flax import traverse_util

    from emip_tpu.convert.torch_import import convert_emip_long_state
    from emip_tpu.losses.seg import hybrid_e_loss
    from emip_tpu.train.state import (
        SHORT_TERM_FREEZE,
        merge_params,
        partition_params,
    )
    from tests.ref_oracle import import_reference

    model, variables = converted
    ref_loss = import_reference("loss.loss_pred").hybrid_e_loss

    rng = np.random.default_rng(11)
    frames = rng.standard_normal((3, 3, SIZE, SIZE)).astype(np.float32)
    gt = (rng.uniform(size=(1, 1, SIZE, SIZE)) > 0.5).astype(np.float32)
    f = [torch.from_numpy(x) for x in frames]

    # ---- torch: memory from (f0, f1), grads through the (f1, f2) step
    with torch.no_grad():
        _, mk, mv = oracle(f[0], f[1], 1, None, None)
    for p in oracle.parameters():
        p.grad = None
    mask2, _, _ = oracle(f[1], f[2], 2, mk.detach(), mv.detach())
    loss_t = ref_loss(mask2, torch.from_numpy(gt))
    loss_t.backward()
    grads_t = {n: p.grad for n, p in oracle.named_parameters()
               if p.grad is not None}
    # gradient reach must be exactly the long head (short_term frozen via
    # the reference's no_grad blocks)
    assert grads_t and all(not n.startswith("short_term.") for n in grads_t)

    # ---- jax: same memory state, same step, grads over the same subtree
    jx = np.transpose(frames, (0, 2, 3, 1))[:, None]
    state = model.init_memory(1)
    _, _, state = model.apply(variables, jx[0], jx[1], state, False,
                              method="step")
    trainable, frozen = partition_params(variables["params"],
                                         SHORT_TERM_FREEZE)
    jg = np.transpose(gt, (0, 2, 3, 1))

    def loss_fn(tr):
        params = merge_params(tr, frozen)
        mask_long, _, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jx[1], jx[2], state, False, method="step")
        return hybrid_e_loss(mask_long, jg)

    loss_j, grads_j = jax.value_and_grad(loss_fn)(trainable)
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=2e-4)

    # convert torch grads through the weight-layout mapping (grads
    # substitute params; buffers ride along and are ignored)
    gsd = {n: p.detach() for n, p in oracle.state_dict().items()}
    gsd.update(grads_t)
    ref_tree = convert_emip_long_state(gsd, depths=DEPTHS)
    ref_trainable, _ = partition_params(ref_tree["params"],
                                        SHORT_TERM_FREEZE)

    got = traverse_util.flatten_dict(grads_j)
    want = traverse_util.flatten_dict(ref_trainable)
    assert set(got) == set(want)

    global_scale = max(
        np.abs(np.asarray(v, np.float64)).max() for v in want.values())
    floor = 1e-6 * global_scale
    failures = []
    for key in sorted(want):
        w = np.asarray(want[key], np.float64)
        g = np.asarray(got[key], np.float64)
        rel = np.abs(g - w).max() / max(np.abs(w).max(), floor)
        if rel > 8e-2:
            failures.append(("/".join(key), float(rel)))
    assert not failures, (
        f"{len(failures)}/{len(want)} leaves above 8e-2; worst: "
        + str(sorted(failures, key=lambda t: -t[1])[:8])
    )
