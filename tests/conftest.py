"""Test configuration: force CPU with 8 virtual devices so sharding/parallel code
paths are exercised without TPU hardware (the bench harness runs on the real chip).

NOTE: the environment pins JAX_PLATFORMS=axon (the TPU tunnel), so we must override
both the env var and the already-imported config."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the CI box is a single core, so XLA compiles dominate
# the suite wall-clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/gpax_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
