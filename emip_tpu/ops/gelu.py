"""Polynomial GELU: erf-free exact-shape gelu for the TPU VPU.

The exact gelu (``0.5*x*(1+erf(x/sqrt(2)))``) costs ~12 ms per b5 backbone
call at 352^2/bs=8 in training (fwd + remat recompute + backward; measured
by tools/profile_pvt_grad.py "gelu->relu" ablation) — XLA lowers erf to a
long fp32 rational. Since activations are bf16 (quantization ~8e-3
relative), an approximation far below that noise floor is numerically
indistinguishable.

Construction: gelu(x) = 0.5*(x + E(x)) with E(x) = x*erf(x/sqrt(2)) EVEN,
so E is fit once in t = 2*x^2/XMAX^2 - 1 with a degree-8 Chebyshev
least-squares polynomial on |x| <= 4.25 (coefficients converted to the
power basis; fit error 4.5e-4). Outside the fit range gelu(x) is
max(x, 0) to machine precision (|gelu(4.25) - 4.25| ~ 4e-5). Full-curve
max error 2.3e-4; the analytic derivative (what autodiff produces) has
~1e-3 max error. Evaluation: 8 fp32 multiply-adds — no transcendentals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gelu_poly", "gelu_poly_native", "gelu_poly_grad"]

_XMAX = 4.25
_UMAX = _XMAX * _XMAX
# power-basis coefficients in t = 2*x^2/_UMAX - 1 (lowest order first)
_COEFFS = (
    2.9971595436497958,
    1.5371125619116355,
    -0.4509052452187631,
    0.31404370133414417,
    -0.2582279417710611,
    0.13723008787425578,
    -0.08286681950003776,
    0.1362792148561566,
    -0.0803648018918999,
)


def gelu_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-shape gelu via an even degree-8 polynomial (|err| <= 2.3e-4)."""
    xf = x.astype(jnp.float32)
    t = jnp.minimum(xf * xf, _UMAX) * (2.0 / _UMAX) - 1.0
    e = jnp.float32(_COEFFS[-1])
    for c in _COEFFS[-2::-1]:
        e = e * t + jnp.float32(c)
    inner = 0.5 * (xf + e)
    out = jnp.where(jnp.abs(xf) >= _XMAX, jnp.maximum(xf, 0.0), inner)
    return out.astype(x.dtype)


# P'(t) of _COEFFS (k * c_k), for the custom-JVP backward: the analytic
# derivative of the SAME degree-8 value polynomial, so the gradient is
# exactly the gradient of the function the forward computes (and its
# ~8.7e-3 deviation from the true gelu' is identical to what autodiff
# through the Horner recurrence produces) — just evaluated as ONE Horner
# pass instead of autodiff's recompute-plus-reverse chain (~2x the ops).
_DCOEFFS = tuple(k * c for k, c in enumerate(_COEFFS) if k > 0)


def _horner(coeffs, t, dt):
    e = jnp.asarray(coeffs[-1], dt)
    for c in coeffs[-2::-1]:
        e = e * t + jnp.asarray(c, dt)
    return e


@jax.custom_jvp
def gelu_poly_native(x: jnp.ndarray) -> jnp.ndarray:
    """gelu_poly evaluated in the INPUT dtype (no fp32 round-trip).

    In bf16 the Horner recurrence loses ~2 decimal digits: measured
    |err| vs exact fp32 gelu is ~2.6e-2 absolute — the same order as bf16
    activation rounding itself. Trades that noise for skipping two
    full-tensor fp32 conversions on the hottest activation in the
    network. The custom JVP evaluates the ANALYTIC polynomial derivative
    (one degree-7 Horner) instead of letting autodiff recompute-and-
    reverse the forward recurrence — same gradient values, fewer ops in
    the PVT backward.
    """
    dt = x.dtype
    t = jnp.minimum(x * x, jnp.asarray(_UMAX, dt)) * jnp.asarray(
        2.0 / _UMAX, dt) - jnp.asarray(1.0, dt)
    e = _horner(_COEFFS, t, dt)
    inner = jnp.asarray(0.5, dt) * (x + e)
    return jnp.where(jnp.abs(x) >= jnp.asarray(_XMAX, dt),
                     jnp.maximum(x, jnp.asarray(0, dt)), inner)


def gelu_poly_grad(x: jnp.ndarray) -> jnp.ndarray:
    """Analytic derivative of the poly gelu, evaluated in x's dtype.

    The same degree-7 Horner the custom JVP uses — exported so Pallas
    backward kernels that recompute the pre-activation in VMEM (e.g.
    :mod:`emip_tpu.ops.pallas.mixffn`) apply the gradient of the SAME
    function the forward computed.
    """
    dt = x.dtype
    t = jnp.minimum(x * x, jnp.asarray(_UMAX, dt)) * jnp.asarray(
        2.0 / _UMAX, dt) - jnp.asarray(1.0, dt)
    g = jnp.asarray(0.5, dt) * (
        jnp.asarray(1.0, dt)
        + _horner(_DCOEFFS, t, dt) * jnp.asarray(4.0 / _UMAX, dt) * x
    )
    return jnp.where(jnp.abs(x) >= jnp.asarray(_XMAX, dt),
                     (x > 0).astype(dt), g)


@gelu_poly_native.defjvp
def _gelu_poly_native_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    dt = x.dtype
    y = gelu_poly_native(x)
    t = jnp.minimum(x * x, jnp.asarray(_UMAX, dt)) * jnp.asarray(
        2.0 / _UMAX, dt) - jnp.asarray(1.0, dt)
    # gelu'(x) = 0.5*(1 + E'(x)),  E'(x) = P'(t) * 4x/UMAX
    g = jnp.asarray(0.5, dt) * (
        jnp.asarray(1.0, dt)
        + _horner(_DCOEFFS, t, dt) * jnp.asarray(4.0 / _UMAX, dt) * x
    )
    g = jnp.where(jnp.abs(x) >= jnp.asarray(_XMAX, dt),
                  (x > 0).astype(dt), g)
    return y, g * dx
