"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-device sharding tests simulate a TPU slice on the host, per the
project test strategy (SURVEY.md §4).

Note: a pytest plugin imports jax before this conftest runs, so env vars
alone are too late — but XLA backends initialize lazily, so configuring via
``jax.config`` here (before any computation) still takes effect.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")

assert jax.default_backend() == "cpu", (
    "tests must run on host CPU; got " + jax.default_backend()
)
assert jax.device_count() == 8, "expected 8 virtual CPU devices for tests"
