"""Test configuration: run all tests on a virtual 8-device CPU mesh.

XLA flags must be set before jax initializes. The machine's axon site hook
forces jax_platforms to "axon,cpu", so we override via jax.config (env vars
are not enough). Real-TPU benchmarks live in bench.py, not the test suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# the DEFAULT persistent compilation cache is shared with TPU runs whose
# CPU AOT artifacts are produced by the remote compile service for a
# DIFFERENT machine type — loading them gives silently wrong numerics
# (cpu_aot_loader machine-feature mismatch). Tests therefore use a
# DEDICATED local cache dir that only ever receives artifacts compiled on
# this machine: correct numerics, and repeat runs skip the multi-minute
# slam_full_step CPU compiles.
_cache_dir = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_test_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_enable_compilation_cache", True)
# the site hook pre-initializes the SHARED cache object pointing at
# ~/.cache/jax_vo_slam_tpu (where remote-compiled CPU artifacts land);
# reset so the next compile re-initializes from the config dir above
try:
    from jax._src.compilation_cache import reset_cache as _reset_cache
    _reset_cache()
except Exception:
    pass
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", jax.devices()
    yield


@pytest.fixture(scope="session")
def synthetic_seq():
    from vo_slam_test_tpu.datasets import SyntheticRGBD

    return SyntheticRGBD(n_frames=8, seed=3)
