"""hannoy-tpu: a TPU-native approximate-nearest-neighbor framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the reference
``hannoy`` crate (LMDB-backed HNSW in Rust — see SURVEY.md): multi-layer
graph ANN over cosine / euclidean / manhattan / hamming / binary-quantized
metrics, incremental insert+delete without re-indexing, filtered search,
cancellable builds and queries, durable host persistence, and a
Database/Writer/Reader Python API.

Compute runs batched on TPU: beam search and construction waves are jitted
fixed-shape programs over HBM-resident adjacency; the host store is the
durable source of truth.
"""

from __future__ import annotations

import os

import jax


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes.

    TPU compiles of the while_loop beam kernels take minutes via the
    remote compiler; the cache makes reopening an index interactive.
    Opt out with HANNOY_TPU_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("HANNOY_TPU_NO_COMPILE_CACHE"):
        return
    # Namespace by platform/env: entries compiled under the axon plugin's
    # CPU tuning flags are not loadable by a plain-CPU process (AOT
    # machine-feature mismatch → potential SIGILL).
    flavor = os.environ.get("JAX_PLATFORMS", "default").replace(",", "_") or "default"
    if "axon_site" in os.environ.get("PYTHONPATH", ""):
        flavor += "-axon"
    if flavor == "cpu-axon":
        # CPU compiles under the axon plugin are routed through the remote
        # compiler; the resulting AOT entries never load locally (machine
        # feature mismatch) — caching them is pure overhead.
        return
    cache_dir = os.environ.get(
        "HANNOY_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "hannoy_tpu", "jax-" + flavor),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimisation, never fatal
        pass


_enable_compilation_cache()

from . import errors  # noqa: E402
from .api import Database, Metric, Reader, Writer  # noqa: E402
from .ops.distances import (  # noqa: E402
    ALL_METRICS,
    BQ_COSINE,
    BQ_EUCLIDEAN,
    BQ_MANHATTAN,
    COSINE,
    EUCLIDEAN,
    HAMMING,
    MANHATTAN,
)
from .version import CURRENT_VERSION, Version  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "Database",
    "Writer",
    "Reader",
    "Metric",
    "errors",
    "Version",
    "CURRENT_VERSION",
    "ALL_METRICS",
    "COSINE",
    "EUCLIDEAN",
    "MANHATTAN",
    "HAMMING",
    "BQ_COSINE",
    "BQ_EUCLIDEAN",
    "BQ_MANHATTAN",
]
