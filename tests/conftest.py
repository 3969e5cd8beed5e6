"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the TPU-world "fake backend" (SURVEY.md §4): sharding/collective logic
is validated on host CPU devices; numerical kernels compare against fp32
references. The axon sitecustomize pins JAX_PLATFORMS=axon (remote TPU
tunnel), so we must both set the env var before the first jax import AND
override via jax.config afterwards — otherwise every test op round-trips
through the tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is compile-dominated (~20 min cold);
# unchanged modules hit the cache on re-runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (full-width parity oracles)")


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """One-shot-suite stability (VERDICT r4 weak #2): after ~180 tests the
    process holds hundreds of live compiled executables, and the next
    persistent-cache READ (backend.deserialize_executable) SIGABRTs inside
    XLA — per-file runs always passed, so the cache entries themselves are
    fine; the abort tracks accumulated in-process executable state. Dropping
    JAX's executable/trace caches between modules keeps the live set small;
    re-compiles within a later module are persistent-cache deserializes
    (~fast), not real compiles.
    """
    yield
    jax.clear_caches()
    gc.collect()
