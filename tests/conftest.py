"""Test harness config: force an 8-virtual-device CPU mesh.

Tests exercise pjit/shard_map partitioning logic on host-local CPU devices
(SURVEY.md §4.3 "distributed-without-a-cluster").  The sandbox's sitecustomize
imports jax at interpreter startup and registers the tunneled TPU backend, so
we override the platform via jax.config (which wins over the already-read
JAX_PLATFORMS env var) before any backend is initialized.
"""

import os

# SCALABLE_E3_TESTS_ON_TPU=1 keeps the tunneled TPU visible so chip-gated
# tests (tests/test_remat_kernel.py) can run:
#   PYTHONPATH=$PWD:$PYTHONPATH SCALABLE_E3_TESTS_ON_TPU=1 \
#     python -m pytest tests/test_remat_kernel.py -q
_ON_TPU = os.environ.get("SCALABLE_E3_TESTS_ON_TPU") == "1"

if not _ON_TPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
