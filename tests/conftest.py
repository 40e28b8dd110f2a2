"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; see ``__graft_entry__.py``). This mirrors the reference's
strategy of pinning rayon for determinism (src/tests/mod.rs:105) — here the
analogue is a fixed device topology + fixed seeds.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    """Deterministic RNG, seed 42 (reference src/tests/mod.rs rng())."""
    return np.random.default_rng(42)
