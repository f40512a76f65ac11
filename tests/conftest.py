"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-device sharding tests simulate a TPU slice on the host, per the
project test strategy (SURVEY.md §4).

Note: a pytest plugin imports jax before this conftest runs, so env vars
alone are too late — but XLA backends initialize lazily, so configuring via
``jax.config`` here (before any computation) still takes effect.
"""

import os

# FORCE, not setdefault: the harness shell exports JAX_PLATFORMS=axon;
# subprocess-spawning tests build their env from os.environ and must
# never inherit the single-client TPU tunnel platform.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# Clear the axon plugin trigger for SUBPROCESSES: during a tunnel outage the
# sitecustomize-time axon.register.register() call blocks every new python
# process (even CPU-only ones) in a connect-retry loop; with the env var
# empty, sitecustomize skips registration entirely and CPU jax works
# (CLAUDE.md "Environment gotchas"). This process already survived its own
# sitecustomize, but test_run_parity/test_multiprocess spawn children.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# No persistent compilation cache under pytest: the cache exists to make
# repeat TPU-tunnel benchmarking cheap; test-suite CPU compiles just bloat
# it (observed 7GB+/4900 entries), and a cache *write* once segfaulted the
# interpreter mid-suite (jax 0.9.0, compilation_cache.put_executable_and_time).
os.environ["EMIP_TPU_NO_COMP_CACHE"] = "1"
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
