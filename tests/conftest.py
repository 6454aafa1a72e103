"""Test harness config: force an 8-virtual-device CPU mesh.

Tests exercise pjit/shard_map partitioning logic on host-local CPU devices
(SURVEY.md §4.3 "distributed-without-a-cluster").  The sandbox's sitecustomize
imports jax at interpreter startup and registers the tunneled TPU backend, so
we override the platform via jax.config (which wins over the already-read
JAX_PLATFORMS env var) before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
