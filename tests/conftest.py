"""Test environment: force an 8-device CPU platform for sharding tests.

The TPU-native analog of a fake distributed backend (SURVEY §4): all tests run
on CPU with 8 virtual XLA devices so data-parallel equivalence can be asserted
without hardware.
"""

import os

# FORCE cpu (not setdefault): the surrounding environment may preset
# JAX_PLATFORMS=axon/tpu, but the suite needs the 8-virtual-device CPU
# platform. JAX resolves the platform lazily at first backend use, which is
# after conftest runs, so this takes effect even though jax may already be
# imported by a sitecustomize hook.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough when a sitecustomize hook already imported
# jax (its config captured JAX_PLATFORMS at import); the config update works
# as long as no backend has been used yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: repeated suite runs (and the driver's) skip
# recompiling the jitted train steps.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
