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
# The persistent compilation cache MUST stay off for CPU test runs: the
# axon remote-compile interposer (PALLAS_AXON_REMOTE_COMPILE, active from
# sitecustomize before any test code runs) serves even CPU compiles from
# the terminal machine, whose XLA:CPU AOT artifacts target different
# machine features (+prefer-no-scatter etc. — cpu_aot_loader warns of
# SIGILL/wrong numerics when loading them). A dedicated local cache dir
# was tried in round 2 and still filled with remote artifacts.
jax.config.update("jax_enable_compilation_cache", False)

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
