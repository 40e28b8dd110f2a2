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


def merge_ranked(
    pool_d: jax.Array,  # [B, K1] ascending (+inf padded)
    pool_ids: jax.Array,  # [B, K1]
    pool_exp: jax.Array,  # [B, K1]
    cand_d: jax.Array,  # [B, K2] unsorted (+inf = dropped)
    cand_ids: jax.Array,  # [B, K2]
    keep: int,
    dedup: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Merge unsorted candidates into a *sorted* pool, keep best ``keep``.

    Rank-based alternative to ``merge_sorted``: the pool is already
    sorted, so each element's output position is its own index plus a
    cross-count — two small compare matrices instead of a ``lax.sort``
    bitonic network over K1+K2 keys. New candidates enter with expanded=0.
    Ties: pool elements win; candidate ties break by column index
    (matching the stable sort). ``dedup=True`` additionally drops
    candidates already in the pool or duplicated earlier in the candidate
    list (the fused form of ``contains`` + ``unique_mask``).

    **Measured slower than merge_sorted on TPU v5e** (5.7 vs 2.6+1.4
    ms/hop at [4096, 48+32]): the final scatter-by-position costs more
    than the bitonic sort it saves (XLA TPU scatter serializes; 3.0 ms
    standalone). Kept as the parity-tested reference formulation and for
    ``scripts/profile_build.py`` regression tracking — the beam hot loop
    uses ``merge_sorted``. See BENCH_NOTES.md.
    """
    B, K1 = pool_d.shape
    K2 = cand_d.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, K2, K2), 2)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, K2, K2), 1)
    if dedup:
        in_pool = jnp.any(
            (pool_ids[:, :, None] == cand_ids[:, None, :]) & (pool_ids[:, :, None] != NO_ID),
            axis=1,
        )  # [B, K2]
        earlier = jnp.any(
            (cand_ids[:, :, None] == cand_ids[:, None, :])
            & (cand_ids[:, :, None] != NO_ID)
            & (idx < pos),
            axis=-1,
        )  # [B, K2] — duplicate of an earlier candidate column
        drop = in_pool | earlier | (cand_ids == NO_ID)
        cand_d = jnp.where(drop, INF, cand_d)
        cand_ids = jnp.where(drop, NO_ID, cand_ids)
    # pool rank: own index + #candidates strictly closer
    lt_pc = cand_d[:, None, :] < pool_d[:, :, None]  # [B, K1, K2]
    pool_pos = jax.lax.broadcasted_iota(jnp.int32, (B, K1), 1) + jnp.sum(
        lt_pc, axis=-1, dtype=jnp.int32
    )
    # candidate rank: #pool entries at-or-closer + #earlier candidates closer
    le_cp = pool_d[:, :, None] <= cand_d[:, None, :]  # [B, K1, K2]
    cc = cand_d[:, None, :] < cand_d[:, :, None]  # [B, K2, K2] cc[j, l]: l<j
    tie = (cand_d[:, None, :] == cand_d[:, :, None]) & (idx < pos)
    cand_pos = jnp.sum(le_cp, axis=1, dtype=jnp.int32) + jnp.sum(
        cc | tie, axis=-1, dtype=jnp.int32
    )
    # +inf never places (also guards inf==inf ties walking positions up)
    pool_pos = jnp.where(jnp.isfinite(pool_d), pool_pos, keep)
    cand_pos = jnp.where(jnp.isfinite(cand_d), cand_pos, keep)

    b_idx = jax.lax.broadcasted_iota(jnp.int32, (B, K1 + K2), 0)
    all_pos = jnp.concatenate([pool_pos, cand_pos], axis=-1)
    all_d = jnp.concatenate([pool_d, cand_d], axis=-1)
    all_ids = jnp.concatenate([pool_ids, cand_ids], axis=-1)
    all_exp = jnp.concatenate([pool_exp, jnp.zeros_like(cand_ids)], axis=-1)
    out_d = jnp.full((B, keep), INF).at[b_idx, all_pos].set(all_d, mode="drop")
    out_ids = jnp.full((B, keep), NO_ID, dtype=pool_ids.dtype).at[b_idx, all_pos].set(
        all_ids, mode="drop"
    )
    out_exp = jnp.zeros((B, keep), dtype=pool_exp.dtype).at[b_idx, all_pos].set(
        all_exp, mode="drop"
    )
    return out_d, out_ids, out_exp


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
