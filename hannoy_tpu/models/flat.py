"""Flat (exact) index — brute-force top-k on device.

The reference uses linear scan in two roles, both replicated here:
* the small-candidate-set fast path of the query engine
  (``brute_force_search``, reader.rs:668-711 + ``should_linear_scan``
  reader.rs:622-640), and
* (in its external benches) the recall ground truth.

On TPU the scan is one ``[B, N]`` distance matrix on the MXU + ``top_k`` —
this is also the framework's recall oracle for tests and benches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import distances
from ..ops.topk import INF, NO_ID


@partial(jax.jit, static_argnames=("metric_name", "k"))
def flat_topk(
    metric_name: str,
    q: jax.Array,  # [B, D*]
    qn: jax.Array,  # [B]
    db: jax.Array,  # [N, D*]
    dbn: jax.Array,  # [N]
    mask: jax.Array,  # [N] or [B, N] bool — candidate/valid slots
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k among masked slots → (dists [B,k], slots [B,k]).

    Masked-out slots return +inf / -1. A 2-D mask filters per query row
    (used by the batched degraded-search top-up).
    """
    metric = distances.by_name(metric_name)
    d = distances.matrix_distances(metric, q, qn, db, dbn)
    d = jnp.where(mask if mask.ndim == 2 else mask[None, :], d, INF)
    neg, idx = jax.lax.top_k(-d, k)
    dists = -neg
    slots = jnp.where(dists < INF, idx, NO_ID)
    return dists, slots
