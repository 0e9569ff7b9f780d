"""Test config: force CPU with a virtual 8-device mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
against `--xla_force_host_platform_device_count=8` fake devices, which is the
idiomatic JAX way to validate pjit/shard_map layouts without a pod.

Note: the environment pins JAX_PLATFORMS=axon via a site hook, so the env var
alone is not enough — we override through the jax config after import.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
