"""Test configuration: force an 8-virtual-device CPU platform.

Tests never assume real TPU hardware; multi-chip sharding is exercised on a
fake 8-device CPU mesh (the standard JAX substitute for a cluster — see
SURVEY.md §4). The host environment pins JAX_PLATFORMS=axon (real TPU via a
remote tunnel) and preloads jax through sitecustomize, so plain env vars are
not enough: we must override through jax.config before any backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute mesh/pipeline XLA compiles. Fast tier: "
        "pytest -m 'not slow' (keep it green every session); full suite "
        "still runs everything.")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_compiler_state():
    """Drop compiled-executable caches after every test module.

    A full-suite run accumulates hundreds of XLA CPU executables; twice the
    suite segfaulted inside backend_compile on the LAST big program
    (test_sift pose parity) while the same test passes in isolation —
    bounding live compiler state avoids the crash. Costs only recompiles
    across module boundaries, which never share programs anyway."""
    yield
    jax.clear_caches()
