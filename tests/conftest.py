"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths (mesh/pjit/shard_map) are validated on a virtual
8-device CPU mesh, per the repo testing strategy (SURVEY.md §4). Pallas
kernels automatically run in interpreter mode on CPU (see
fissure_segmentation_tpu.ops._config.interpret_mode).
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
