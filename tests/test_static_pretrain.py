"""Static-image pretrain path: loader + SegNetwork train step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from emip_tpu.data.pipeline import StaticImageLoader
from emip_tpu.data.synthetic import make_synthetic_static_root
from emip_tpu.losses.seg import hybrid_e_loss
from emip_tpu.models.emip_short import SegNetwork
from emip_tpu.train.state import build_optimizer


@pytest.fixture(scope="module")
def static_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cod10k")
    return make_synthetic_static_root(str(root), num_images=8)


def test_static_loader(static_root):
    loader = StaticImageLoader(static_root, batch_size=4, size=64,
                               num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 64, 64, 3)
    assert batches[0]["gt"].shape == (4, 64, 64, 1)


def test_static_train_step_reduces_loss(static_root):
    from tests.helpers import TINY_PVT
    from emip_tpu.models.backbones import register_backbone
    from emip_tpu.models.pvt_v2 import PVTv2

    register_backbone(
        "pvt_v2_tiny",
        lambda dtype: PVTv2(config=TINY_PVT, dtype=dtype),
        TINY_PVT.embed_dims,
    )
    model = SegNetwork(backbone_name="pvt_v2_tiny", channel=8)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    tx = build_optimizer(learning_rate=5e-4)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, batch, rng):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": stats}, batch["image"],
                train=True, rngs={"droppath": rng},
                mutable=["batch_stats"],
            )
            return hybrid_e_loss(logits, batch["gt"]), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    loader = StaticImageLoader(static_root, batch_size=4, size=64,
                               num_workers=2, seed=3)
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(5):
        for batch in loader:
            rng, srng = jax.random.split(rng)
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  batch, srng)
            losses.append(float(loss))
    assert np.isfinite(losses[-1])
    assert np.mean(losses[-2:]) < np.mean(losses[:2])
