"""Sorted-list / top-k primitives for beam search.

The TPU-native replacement of the reference's heap structures —
``BinaryHeap`` candidates + ``MinMaxHeap`` results in the hot loop
(hnsw.rs:469-470, reader.rs:311-312) and ``OrderedFloat`` total order
(ordered_float.rs:8-29). Heaps are pointer-chasing and data-dependent; on
TPU we keep fixed-width *sorted arrays* and replace push/pop with
whole-array sort-merge (``jax.lax.sort``), which the VPU executes as a
bitonic network.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Sentinel id for empty slots (reference uses heap emptiness).
NO_ID = jnp.int32(-1)
#: Sentinel distance for empty slots — sorts after every real distance.
INF = jnp.float32(jnp.inf)


def sort_by_dist(dists: jax.Array, *payloads: jax.Array) -> tuple[jax.Array, ...]:
    """Sort rows ascending by distance along the last axis.

    ``dists`` is the key; every payload array is permuted identically.
    +inf (empty) slots end up last, so a "size-k sorted list" is simply
    the first k columns.
    """
    return jax.lax.sort((dists, *payloads), dimension=-1, num_keys=1)


def merge_sorted(
    r_dists: jax.Array,  # [..., K1]
    r_payloads: tuple[jax.Array, ...],
    n_dists: jax.Array,  # [..., K2]
    n_payloads: tuple[jax.Array, ...],
    keep: int,
) -> tuple[jax.Array, tuple[jax.Array, ...]]:
    """Merge a sorted result list with new candidates, keep best ``keep``.

    Replaces the reference's ``res.push_pop_max`` loop (hnsw.rs:505-513):
    one concat + sort instead of ef sequential heap ops.
    """
    d = jnp.concatenate([r_dists, n_dists], axis=-1)
    ps = tuple(
        jnp.concatenate([rp, np_], axis=-1) for rp, np_ in zip(r_payloads, n_payloads)
    )
    out = sort_by_dist(d, *ps)
    return out[0][..., :keep], tuple(o[..., :keep] for o in out[1:])


def contains(ids_a: jax.Array, ids_b: jax.Array) -> jax.Array:
    """For each element of ``ids_a [..., K]``, is it present in
    ``ids_b [..., L]``? → bool [..., K].

    The beam-local dedup that replaces the reference's RoaringBitmap
    visited set (hnsw.rs:471, SURVEY §7 "visited-set" hard part): a
    pairwise compare matrix on the VPU instead of a dynamic hash/bitmap.
    ``NO_ID`` never matches.
    """
    eq = ids_a[..., :, None] == ids_b[..., None, :]
    hit = jnp.any(eq & (ids_b[..., None, :] != NO_ID), axis=-1)
    return hit & (ids_a != NO_ID)


def unique_mask(ids: jax.Array) -> jax.Array:
    """Mask keeping only the first occurrence of each id along the last
    axis (NO_ID slots are kept=False)."""
    k = ids.shape[-1]
    eq = ids[..., :, None] == ids[..., None, :]
    idx = jax.lax.broadcasted_iota(jnp.int32, eq.shape, dimension=eq.ndim - 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, eq.shape, dimension=eq.ndim - 2)
    earlier_dup = jnp.any(eq & (idx < pos), axis=-1)
    return (~earlier_dup) & (ids != NO_ID)
