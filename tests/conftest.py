"""Test env: force CPU with 8 virtual devices so sharding tests run
without a TPU slice (SURVEY.md section 4, item 4).

Note: this container's sitecustomize registers the `axon` TPU PJRT plugin
and pins jax_platforms programmatically, so the JAX_PLATFORMS env var is
not enough -- override via jax.config before any backend initialization.
"""

import os
import pathlib
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: big jitted programs (CLI e2e fixtures, train
# steps) carry across pytest processes instead of recompiling each run
from tokenreduction_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
