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


@pytest.fixture
def rng():
    return np.random.RandomState(0)
