"""Batched α-SNG robust pruning and link-row merging.

The TPU replacement for the reference's ``robust_prune`` (hnsw.rs:565-597)
and the overflow handling in ``add_link`` (hnsw.rs:523-560). Where the
reference walks candidate pairs one SIMD distance at a time (re-reading
both vectors from LMDB per pair, hnsw.rs:583-589), here:

1. the full candidate-candidate distance matrix ``[B, K, K]`` is computed
   in one MXU/VPU pass (SURVEY §7 hard-parts: the ``B×ef×ef`` tensor), and
2. the greedy selection becomes a ``lax.scan`` over candidate rank whose
   state is just a selection mask — each step consults one row of the
   precomputed matrix.

Semantics: candidates sorted ascending by distance-to-query; candidate ``c``
is selected iff for every already-selected ``s``: ``d(c,s) * α >= d(c,q)``
(strict ``<`` rejects, hnsw.rs:585), until ``cap`` are selected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import distances, topk
from .topk import INF, NO_ID


def pairwise_block(
    metric: distances.Metric,
    vecs: jax.Array,  # [B, K, D*]
    norms: jax.Array,  # [B, K]
) -> jax.Array:
    """All-pairs distances within each row's candidate set → [B, K, K].

    With HANNOY_TPU_BULK_BF16=1 the f32 dot-metric einsums run one bf16
    MXU pass (f32 accumulate) instead of Precision.HIGHEST's 3-6 passes.
    The [B, K, K] block exists only to feed the α-prune's threshold test
    (pair·α < cand_d) — a ~1e-3 relative error can flip decisions only
    for near-tied candidates, which the prune treats as interchangeable.
    This block is the FLOP-dominant leg of the 1M bulk connect
    (~15 TFLOP at K=104), so the knob trades nothing measurable for a
    multi-pass reduction; see BENCHMARKS.md round 4 for the A/B."""
    name = metric.name
    if vecs.dtype == jnp.int8:
        if name == "cosine":
            vecs = vecs.astype(jnp.float32)
        else:
            # euclidean/manhattan int8 tier: norms carry per-row scales
            vecs = distances._deq(vecs, norms)
    if (
        distances.BULK_BF16
        and vecs.dtype == jnp.float32
        and name in ("cosine", "euclidean")
    ):
        vecs = vecs.astype(jnp.bfloat16)
    bf16 = vecs.dtype == jnp.bfloat16
    prec = None if bf16 else distances.MATMUL_PRECISION
    if name == "cosine":
        dots = jnp.einsum(
            "bkd,bld->bkl", vecs, vecs, preferred_element_type=jnp.float32,
            precision=prec,
        )
        denom = norms[:, :, None] * norms[:, None, :]
        cos = jnp.clip(dots / jnp.maximum(denom, 1.1920929e-07), -1.0, 1.0)
        return jnp.where(denom > 1.1920929e-07, (1.0 - cos) * 0.5, 0.0)
    if name == "euclidean":
        # norm expansion: |a|²+|b|²-2ab — ranking-equivalent, MXU-friendly
        dots = jnp.einsum(
            "bkd,bld->bkl", vecs, vecs, preferred_element_type=jnp.float32,
            precision=prec,
        )
        sq = jnp.einsum(
            "bkd,bkd->bk", vecs, vecs, preferred_element_type=jnp.float32,
            precision=prec,
        )
        return jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * dots, 0.0)
    if name == "manhattan":
        return jnp.sum(
            jnp.abs(vecs[:, :, None, :].astype(jnp.float32) - vecs[:, None, :, :].astype(jnp.float32)),
            axis=-1,
        )
    pc = jnp.sum(
        jax.lax.population_count(vecs[:, :, None, :] ^ vecs[:, None, :, :]).astype(jnp.int32),
        axis=-1,
    )
    d_pad = vecs.shape[-1] * 32
    return distances._packed_from_popcount(name, pc, d_pad, norms[:, :, None] * norms[:, None, :])


def robust_prune(
    metric: distances.Metric,
    vectors: jax.Array,  # [N_pad, D*] store
    norms: jax.Array,  # [N_pad]
    cand_ids: jax.Array,  # [B, K] slots sorted ascending by cand_d, -1 padded
    cand_d: jax.Array,  # [B, K]
    cap: int,
    alpha: float,
) -> tuple[jax.Array, jax.Array]:
    """α-prune each row's candidate list → (sel_ids [B, cap], sel_d [B, cap]).

    Output stays ascending by distance; unused slots are (-1, +inf).
    """
    B, K = cand_ids.shape
    valid = (cand_ids != NO_ID) & jnp.isfinite(cand_d) & topk.unique_mask(cand_ids)
    vecs = vectors[jnp.maximum(cand_ids, 0)]
    nrms = norms[jnp.maximum(cand_ids, 0)]
    pair = pairwise_block(metric, vecs, nrms)  # [B, K, K]

    def step(state, t):
        sel_mask, count = state
        c_d = cand_d[:, t]
        conflict = jnp.any(sel_mask & (pair[:, t, :] * alpha < c_d[:, None]), axis=-1)
        ok = valid[:, t] & ~conflict & (count < cap)
        sel_mask = sel_mask.at[:, t].set(ok)
        return (sel_mask, count + ok.astype(jnp.int32)), None

    # derive the carry from traced inputs so shard_map's varying-manual-axes
    # tracking matches between init and output (zeros_like inherits VMA)
    init = (
        jnp.zeros_like(cand_ids, dtype=bool),
        jnp.zeros_like(cand_d[:, 0], dtype=jnp.int32),
    )
    (sel_mask, _), _ = jax.lax.scan(step, init, jnp.arange(K))

    d = jnp.where(sel_mask, cand_d, INF)
    ids = jnp.where(sel_mask, cand_ids, NO_ID)
    d, ids = topk.sort_by_dist(d, ids)
    return ids[:, :cap], d[:, :cap]


def merge_link_rows(
    metric: distances.Metric,
    vectors: jax.Array,
    norms: jax.Array,
    row_ids: jax.Array,  # [U, cap] existing neighbor slots
    row_d: jax.Array,  # [U, cap]
    inc_ids: jax.Array,  # [U, K] incoming neighbor slots
    inc_d: jax.Array,  # [U, K]
    cap: int,
    alpha: float,
) -> tuple[jax.Array, jax.Array]:
    """Merge incoming (reverse) edges into existing link rows.

    Reference ``add_link`` appends while there is room and α-prunes the
    row on overflow (hnsw.rs:538-552; the reference drops the incoming
    link when full — here the α-prune runs over existing ∪ incoming, a
    documented deviation that can only improve the row).
    """
    ids = jnp.concatenate([row_ids, inc_ids], axis=-1)
    d = jnp.concatenate([row_d, inc_d], axis=-1)
    keep = topk.unique_mask(ids) & jnp.isfinite(d)
    d = jnp.where(keep, d, INF)
    ids = jnp.where(keep, ids, NO_ID)
    d, ids = topk.sort_by_dist(d, ids)
    n_total = jnp.sum(ids != NO_ID, axis=-1)

    pruned_ids, pruned_d = robust_prune(metric, vectors, norms, ids, d, cap, alpha)
    fits = (n_total <= cap)[:, None]
    out_ids = jnp.where(fits, ids[:, :cap], pruned_ids)
    out_d = jnp.where(fits, d[:, :cap], pruned_d)
    return out_ids, out_d
