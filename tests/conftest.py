"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (the JAX analogue of a fake multi-node backend).

NOTE: the dev/CI image injects an `axon` PJRT plugin via sitecustomize that calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start — the
JAX_PLATFORMS env var alone is NOT enough; we must update the config back after
importing jax (backends initialize lazily, so this is safe pre-first-use).
"""

import os

_platform = os.environ.get("MMPFN_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

# Persistent XLA compile cache for the test session (and across sessions):
# the suite's wall time is dominated by CPU XLA compiles, and the per-module
# cache clearing below (segfault workaround) forces shared programs to
# recompile in later modules. CPU executable serialization is cheap (unlike
# the remote-TPU tunnel, where the production default keeps this off — see
# utils/compile_cache.py), so cleared modules re-LOAD from disk instead.
# Opt out with MMPFN_TEST_JAX_CACHE=0; point elsewhere by setting it to a path.
_cache = os.environ.get("MMPFN_TEST_JAX_CACHE", "/tmp/mmpfn_test_jax_cache")
if _cache not in ("0", ""):
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    jaxlib's CPU backend segfaults inside `backend_compile_and_load` once a
    single long pytest process has accumulated a few hundred compiled
    programs (reproducible at the same test ~93% into the full suite; RSS is
    <10 GB, so not host OOM — it is JIT-code accumulation, not data).
    Per-module cache clearing keeps within-module reuse (where almost all
    shape sharing lives) while bounding the live-executable count.
    """
    yield
    jax.clear_caches()
