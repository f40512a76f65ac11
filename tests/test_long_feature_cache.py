"""Cached per-frame encodings == the recompute-both-frames step.

``EMIPLong.step_cached`` threads frame t's frozen short-term encoding to
frame t+1 instead of re-encoding the pair (reference model_long.py:80-86
re-encodes every frame twice). The per-frame encoding stages are pure in
the frame (LayerNorm/InstanceNorm only), so mask and memory state must
match ``step`` exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from emip_tpu.models.emip_long import EMIPLong
from tests.helpers import tiny_short_config

SIZE = 64


def _build(memory_size=3):
    cfg = tiny_short_config(inp_size=SIZE)
    model = EMIPLong(config=cfg, memory_size=memory_size)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), img, img, model.init_memory(1), False
    )
    return model, variables


def test_step_cached_matches_step():
    model, variables = _build()
    rng = np.random.default_rng(3)
    f = [jnp.asarray(rng.standard_normal((2, SIZE, SIZE, 3)), jnp.float32)
         for _ in range(3)]

    # two chained uncached steps
    mem = model.init_memory(2)
    m1, _, mem1 = model.apply(variables, f[0], f[1], mem, False)
    m2, _, mem2 = model.apply(variables, f[1], f[2], mem1, False)

    # the same two steps with the encoding carried across
    mem = model.init_memory(2)
    enc0 = model.apply(variables, f[0],
                       method=lambda m, x: m.encode_frame(x))
    c1, enc1, memc1 = model.apply(
        variables, enc0, f[1], mem, False,
        method=lambda m, e, x, s, t: m.step_cached(e, x, s, t),
    )
    c2, enc2, memc2 = model.apply(
        variables, enc1, f[2], memc1, False,
        method=lambda m, e, x, s, t: m.step_cached(e, x, s, t),
    )

    np.testing.assert_allclose(np.asarray(c1), np.asarray(m1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(m2),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mem2),
                    jax.tree_util.tree_leaves(memc2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    # the carried encoding equals a fresh encode of the same frame
    fresh = model.apply(variables, f[2],
                        method=lambda m, x: m.encode_frame(x))
    for a, b in zip(jax.tree_util.tree_leaves(enc2),
                    jax.tree_util.tree_leaves(fresh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
