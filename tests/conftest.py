"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise multi-device code paths without
hardware (SURVEY.md §4): sharding, collectives, and global-batch norm all
behave exactly as they would across a real TPU slice.
"""

import os

# must be set before jax is imported anywhere (override: the session env may
# point JAX_PLATFORMS at the real TPU, but unit tests run on the CPU mesh)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS, so pin the platform again through the config API
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# persistent jit cache (core/jit_cache.py): many tests compile the same
# decoder/DeepLab programs — content-hash-keyed on-disk caching dedupes
# them within a run and across suite runs on the same machine. The dir is
# shared with subprocess-spawning tests via the env var.
from gan_segmentation_tpu.core.jit_cache import enable_persistent_cache

_cache_dir = os.environ.setdefault(
    "GAN_SEG_JIT_CACHE_DIR", "/tmp/gan_seg_test_jit_cache")
enable_persistent_cache(_cache_dir)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
