"""Accuracy bounds of the erf-free polynomial GELU (ops/gelu.py).

The poly gelu replaces XLA's exact erf lowering on the PVT MixFFN hot path
(PVT_V2_VARIANTS default); these tests pin the documented error bounds so a
coefficient regression cannot silently degrade training numerics.
"""

import numpy as np
import scipy.special as sp

import jax.numpy as jnp

from emip_tpu.ops.gelu import gelu_poly, gelu_poly_native


def _exact(x):
    return 0.5 * x * (1.0 + sp.erf(x / np.sqrt(2.0)))


def test_gelu_poly_fp32_bound():
    x = np.linspace(-10.0, 10.0, 20001).astype(np.float32)
    got = np.asarray(gelu_poly(jnp.asarray(x)), np.float64)
    err = np.abs(got - _exact(x.astype(np.float64)))
    assert err.max() < 3e-4, err.max()  # documented |err| <= 2.3e-4


def test_gelu_poly_bf16_storage():
    """bf16 in/out with the fp32-evaluated poly: error ~ bf16 rounding."""
    x = np.linspace(-8.0, 8.0, 8001)
    xb = jnp.asarray(x, jnp.bfloat16)
    got = np.asarray(gelu_poly(xb), np.float64)
    ref = np.asarray(jnp.asarray(_exact(np.asarray(xb, np.float64))
                                 ).astype(jnp.bfloat16), np.float64)
    assert np.abs(got - ref).max() < 0.05


def test_gelu_poly_native_bf16_bound():
    """Native-dtype Horner in bf16: ~3x pure rounding, still activation-
    noise scale (documented 0.046 max abs on |x|<=6)."""
    x = np.linspace(-6.0, 6.0, 6001)
    got = np.asarray(gelu_poly_native(jnp.asarray(x, jnp.bfloat16)),
                     np.float64)
    assert np.abs(got - _exact(x)).max() < 0.06


def test_gelu_poly_native_fp32_bound():
    """Native eval in fp32 uses the same degree-8 fit as gelu_poly."""
    x = np.linspace(-10.0, 10.0, 20001).astype(np.float32)
    got = np.asarray(gelu_poly_native(jnp.asarray(x)), np.float64)
    assert np.abs(got - _exact(x.astype(np.float64))).max() < 3e-4


def test_gelu_poly_native_grad_close():
    """custom_jvp analytic derivative (the deg-8 poly's own P') vs exact
    gelu': same ~8.7e-3 bound autodiff through the Horner chain gives."""
    import jax

    x = jnp.asarray(np.linspace(-6.0, 6.0, 2001), jnp.float32)
    g_poly = jax.vmap(jax.grad(gelu_poly_native))(x)
    g_exact = jax.vmap(jax.grad(
        lambda v: 0.5 * v * (1 + jax.scipy.special.erf(v / np.sqrt(2)))))(x)
    assert float(jnp.abs(g_poly - g_exact).max()) < 1e-2


def test_gelu_poly_native_jvp_matches_autodiff_of_value_poly():
    """The custom JVP must equal autodiff of the value polynomial itself
    (same function, same gradient — only the evaluation path differs)."""
    import jax

    from emip_tpu.ops import gelu as gmod

    x = jnp.asarray(np.linspace(-6.0, 6.0, 2001), jnp.float32)

    def value_poly_only(v):
        # re-evaluate the forward WITHOUT the custom_jvp wrapper
        dt = v.dtype
        t = jnp.minimum(v * v, jnp.asarray(gmod._UMAX, dt)) * jnp.asarray(
            2.0 / gmod._UMAX, dt) - jnp.asarray(1.0, dt)
        e = gmod._horner(gmod._COEFFS, t, dt)
        inner = jnp.asarray(0.5, dt) * (v + e)
        return jnp.where(jnp.abs(v) >= jnp.asarray(gmod._XMAX, dt),
                         jnp.maximum(v, jnp.asarray(0, dt)), inner)

    g_custom = jax.vmap(jax.grad(gelu_poly_native))(x)
    g_auto = jax.vmap(jax.grad(value_poly_only))(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=0, atol=2e-6)


def test_gelu_poly_grad_close():
    import jax

    x = jnp.asarray(np.linspace(-5.0, 5.0, 501), jnp.float32)
    g_poly = jax.vmap(jax.grad(lambda v: gelu_poly(v)))(x)
    g_exact = jax.vmap(jax.grad(
        lambda v: 0.5 * v * (1 + jax.scipy.special.erf(v / np.sqrt(2)))))(x)
    # worst case ~7e-3 sits at the |x|=XMAX seam where the fit hands off
    # to max(x, 0); elsewhere the analytic derivative tracks at ~1e-3
    assert float(jnp.abs(g_poly - g_exact).max()) < 1e-2
