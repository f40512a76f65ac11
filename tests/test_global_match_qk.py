"""Flash-matching global correlation: fused-QK path equivalence.

``EMIP_GLOBAL_MATCH_QK=1`` (the default) routes the global-matching
softmax expectation through ``fused_flow_attention`` with (f0, f1) /
(f1, f0) as q/k — recomputing the correlation per row-tile in VMEM
instead of reading the materialized volume (reference semantics:
gmflow/matching.py:8-41). These tests pin the three implementations
(fused-QK kernel, round-2 read-corr kernel, pure XLA) to each other,
values and gradients, bidirectional.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emip_tpu.models.gmflow.matching import global_correlation_softmax


def _inputs(b=2, h=6, w=8, c=16, dtype=jnp.float32):
    k0, k1 = jax.random.split(jax.random.PRNGKey(7))
    f0 = jax.random.normal(k0, (b, h, w, c), dtype)
    f1 = jax.random.normal(k1, (b, h, w, c), dtype)
    return f0, f1


@pytest.mark.parametrize("bidir", [False, True])
def test_fused_qk_matches_xla_and_read_corr(monkeypatch, bidir):
    f0, f1 = _inputs()

    monkeypatch.setenv("EMIP_GLOBAL_MATCH_QK", "1")
    flow_qk, _, corr_qk = global_correlation_softmax(f0, f1, bidir)
    monkeypatch.setenv("EMIP_GLOBAL_MATCH_QK", "0")
    flow_rd, _, corr_rd = global_correlation_softmax(f0, f1, bidir)
    flow_ref, _, corr_ref = global_correlation_softmax(
        f0, f1, bidir, use_pallas=False
    )

    np.testing.assert_allclose(corr_qk, corr_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(corr_rd, corr_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(flow_qk, flow_ref, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(flow_rd, flow_ref, atol=1e-4, rtol=1e-4)
    assert flow_qk.shape[0] == (2 * f0.shape[0] if bidir else f0.shape[0])


def test_fused_qk_gradients_match(monkeypatch):
    f0, f1 = _inputs(b=1, h=4, w=8, c=8)

    def loss(f0, f1):
        flow, _, corr = global_correlation_softmax(f0, f1, True)
        # both consumers of the features: expectation flow AND the raw
        # corr volume (the motion-prompt path)
        return jnp.sum(flow**2) + 0.1 * jnp.sum(jnp.tanh(corr))

    monkeypatch.setenv("EMIP_GLOBAL_MATCH_QK", "1")
    g_qk = jax.grad(loss, argnums=(0, 1))(f0, f1)
    monkeypatch.setenv("EMIP_GLOBAL_MATCH_QK", "0")
    g_rd = jax.grad(loss, argnums=(0, 1))(f0, f1)

    def loss_ref(f0, f1):
        flow, _, corr = global_correlation_softmax(f0, f1, True, use_pallas=False)
        return jnp.sum(flow**2) + 0.1 * jnp.sum(jnp.tanh(corr))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(f0, f1)
    for got, rd, want in zip(g_qk, g_rd, g_ref):
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(rd, want, atol=2e-4, rtol=2e-4)


def test_fused_qk_bf16_features(monkeypatch):
    """Production dtype: bf16 features, fp32 flow out, both directions."""
    f0, f1 = _inputs(dtype=jnp.bfloat16)
    monkeypatch.setenv("EMIP_GLOBAL_MATCH_QK", "1")
    flow_qk, _, _ = global_correlation_softmax(f0, f1, True)
    flow_ref, _, _ = global_correlation_softmax(f0, f1, True, use_pallas=False)
    assert flow_qk.dtype == jnp.float32
    np.testing.assert_allclose(flow_qk, flow_ref, atol=2e-3, rtol=2e-3)
