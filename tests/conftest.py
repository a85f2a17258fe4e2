"""Test configuration: force CPU with 8 virtual devices so sharding/parallel code
paths are exercised without TPU hardware (the bench harness runs on the real chip).

NOTE: the environment pins JAX_PLATFORMS=axon (the TPU tunnel), so we must override
both the env var and the already-imported config.

NOTE: do NOT enable the persistent compilation cache here — on this host the
XLA:CPU AOT loader reports compile/execute machine-feature mismatches and has
produced silently wrong numerics (NaNs) when loading cached executables.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
