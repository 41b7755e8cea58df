"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths (mesh/pjit/shard_map) are validated on a virtual
8-device CPU mesh, per the repo testing strategy (SURVEY.md §4). Pallas
kernels automatically run in interpreter mode on CPU (see
fissure_segmentation_tpu.ops._config.interpret_mode).
"""
import os

# Must be set before jax is imported anywhere. NOTE: this environment
# presets JAX_PLATFORMS=axon (the remote TPU tunnel) AND a sitecustomize
# that re-registers the axon plugin in every interpreter — tests must FORCE
# the local CPU backend via jax.config (env alone is overridden), otherwise
# every op round-trips through the tunnel (minutes of stall per test run).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: XLA-CPU compiles of the big scan graphs
# (epoch loops, marching tetrahedra) dominate test time otherwise
from fissure_segmentation_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache(min_compile_secs=0.05)
assert jax.default_backend() == "cpu", jax.devices()
assert len(jax.devices()) == 8

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
