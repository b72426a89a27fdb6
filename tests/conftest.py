"""Test harness bootstrap.

This environment boots every Python process through an `axon` sitecustomize
(PYTHONPATH=/root/.axon_site) that imports JAX and pins the platform to the
tunneled TPU. Tests must instead run on local CPU with 8 virtual devices
(SURVEY.md §4: collectives testable without a pod) — TPU-tunnel compiles
would make test wall-clock pathological. The sitecustomize has already
imported JAX by the time this file runs, but the backend client is created
lazily, so overriding ``jax_platforms`` here still wins; XLA_FLAGS is also
read lazily at CPU-client creation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: this box has 2 slow vCPUs and compile time
# otherwise dominates test wall-clock. Machine-scoped because XLA:CPU AOT
# blobs are feature-set specific (utils/cachedir.py).
from direct_lidar_odometry_tpu.utils.cachedir import machine_scoped

jax.config.update(
    "jax_compilation_cache_dir", machine_scoped("/root/.cache/jax_test_cache")
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
