"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; see ``__graft_entry__.py``). This mirrors the reference's
strategy of pinning rayon for determinism (src/tests/mod.rs:105) — here the
analogue is a fixed device topology + fixed seeds.

The axon TPU plugin's sitecustomize force-sets ``jax_platforms="axon,cpu"``
via jax.config at interpreter start, so plain env vars are ignored; we
override the config directly before any backend initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses / cache flavor

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# CPU-mesh compiles are cheap; the persistent-cache *write* path
# (backend_compile_and_load → _compile_and_write_cache → zstd) has
# segfaulted twice mid-suite on this jax build after ~100 in-process
# compilations — disable it for tests.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    """Deterministic RNG, seed 42 (reference src/tests/mod.rs rng())."""
    return np.random.default_rng(42)
