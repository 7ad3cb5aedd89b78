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
