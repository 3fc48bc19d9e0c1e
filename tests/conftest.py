"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-device logic is exercised with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` per the reference test
strategy we designed (SURVEY.md §4): a TPU-less CI runs everything on CPU, and
sharding paths are validated on the virtual device mesh.

Env vars must be set before the first ``import jax`` anywhere, which pytest
guarantees by importing conftest first.
"""

import os

# Force the CPU backend with 8 virtual devices (overriding any preset
# JAX_PLATFORMS, e.g. the axon TPU tunnel). Set ARFLOW_TEST_TPU=1 to run the
# suite against the real accelerator instead (single device; the sharded
# e2e tests will be skipped).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("ARFLOW_TEST_TPU"):
    # The env var route is latched by the preinstalled axon plugin; the config
    # update reliably selects the CPU backend.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)  # float64 oracles in parity tests
# Persistent compilation cache: repeated test runs skip XLA recompiles
# (minutes each on this single-core host).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# This JAX build defaults matmuls/convs to low (bf16-style) precision even on
# CPU; parity tests against torch float32 oracles need full f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
