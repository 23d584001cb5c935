"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Distributed code paths (shard_map/ppermute halo exchange, psum reductions)
are exercised on a fake 8-device CPU mesh — the standard JAX trick
(SURVEY.md §4 item 4); the same SPMD code runs unchanged on TPU meshes.

NOTE: this environment force-registers a TPU ("axon") PJRT plugin via
sitecustomize and sets JAX_PLATFORMS=axon, so we must override the platform
*in process* before any backend initialization.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the distributed (8-fake-device) solver programs
# take minutes to partition+compile; cache hits make suite reruns fast
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
