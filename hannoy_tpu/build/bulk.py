"""Bulk cluster-blocked construction — the MXU fresh-build path.

The reference builds its graph by *sequential-ish* insertion: every item
runs a greedy descent plus an ef-wide beam search against the partial
graph (hnsw.rs:291-328), so construction cost is dominated by per-hop
neighbor-row fetches. The wave builder (``builder.py``) batches that same
algorithm, but its hot op is still the [W·M0]-row HBM gather per beam
iteration, which on TPU has a hard per-row cost floor (~42 ns/row at
768d regardless of dtype — BENCH_NOTES.md round 2); the measured ceiling
of any beam-based builder on one v5e is ~10k vec/s.

This module replaces insertion entirely for large *fresh* builds with a
construction that is dense-matmul-shaped, the way the hardware wants it:

1. **k-means partition** (few Lloyd iterations, one batched
   assignment matmul + one one-hot centroid-update matmul per pass —
   all MXU).
2. **Candidate generation**: every cluster computes one dense distance
   block against itself and its A nearest clusters
   (``distances.block_distances``, batched einsum) and takes each row's
   top-K — a high-quality approximate-kNN candidate list without a
   single per-row gather in the inner loop.
3. **Connect**: α-prune each candidate list (``ops.prune.robust_prune``,
   the same rule the insertion path uses — hnsw.rs:565-597), scatter
   forward rows, then merge reverse edges with the deterministic
   sorted-COO pass shared with the wave builder
   (``wave_ops.reverse_merge_edges`` — add_link semantics,
   hnsw.rs:523-560), and force-repair stranded rows
   (``wave_ops._ensure_inbound``).
4. Upper layers repeat the same recipe on their (much smaller) member
   sets — exact brute-force kNN below ``BRUTE_MAX`` members, recursive
   clustering above.

The result intentionally differs from the reference's graph *structure*
(SURVEY §7 hard-parts: recall parity, not structure parity, is the
success criterion — the reference itself is nondeterministic under >1
thread) while keeping every invariant the search stack relies on:
ascending link rows, -1/+inf sentinels, entry points at the top layer,
per-layer membership by sampled level.

Equivalent prior art for the shape of this algorithm (not its code):
k-means/IVF partitions and GPU bulk kNN-graph construction (CAGRA-style)
— see PAPERS.md. Everything here is original JAX.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hnsw import DeviceGraph
from ..ops import distances, prune
from ..ops.topk import INF, NO_ID
from ..utils.tracing import span
from . import wave_ops

import os as _os

#: member counts at or below this use exact brute-force kNN candidates
BRUTE_MAX = int(_os.environ.get("HANNOY_TPU_BULK_BRUTE_MAX", 16384))
#: rows connected per fori step (prune gathers [CW, K, D] — VMEM/HBM bound)
CONNECT_CHUNK = 4096
#: k-means assignment chunk (rows per matmul)
KMEANS_CHUNK = 8192
#: clusters per candidate-generation fori step
CAND_GROUP = 4

#: metrics the dense block path supports. Dot metrics ride the MXU
#: directly; the packed codecs ride it through the exact popcount-as-dot
#: identity (distances.unpack_bits): candidate blocks unpack to {0,1}
#: bf16 and every packed distance is recovered from
#: ``pc = pc(p)+pc(q)-2·dot``. f32 manhattan would materialize
#: [G, S, T, D] — it stays on the wave path.
BULK_METRICS = (
    "cosine",
    "euclidean",
    "hamming",
    "binary quantized cosine",
    "binary quantized euclidean",
    "binary quantized manhattan",
)


def eligible(metric, n_active: int, n_deleted: int, n_insert: int, opts) -> bool:
    """Bulk path applies to large fresh builds of every metric except f32
    manhattan (packed codecs ride the MXU via popcount-as-dot).

    Incremental builds (pre-existing active graph) and deletes keep the
    wave path — their semantics (journal-driven insert/delete into a live
    graph, writer.rs:521-603) are insertion-shaped by nature.
    """
    if opts.bulk is False:
        return False
    if metric.name not in BULK_METRICS:
        return False
    if n_active or n_deleted:
        return False
    if opts.bulk is True:
        return n_insert > 1
    return n_insert >= opts.bulk_threshold


# --------------------------------------------------------------------------
# k-means partition (device)
# --------------------------------------------------------------------------


def _pad_to(a: np.ndarray, multiple: int, fill) -> np.ndarray:
    pad = (-len(a)) % multiple
    if not pad:
        return a
    return np.concatenate([a, np.full((pad,) + a.shape[1:], fill, dtype=a.dtype)])


@partial(jax.jit, static_argnames=("metric_name", "n_steps", "chunk"))
def _kmeans_step(
    vectors: jax.Array,
    norms: jax.Array,
    member_slots: jax.Array,  # [n_pad] (-1 padded to chunk multiple)
    centroids: jax.Array,  # [C, D]
    metric_name: str,
    n_steps: int,
    chunk: int,
):
    """One Lloyd iteration: chunked assignment + one-hot centroid update.

    Returns (new_centroids, assignment [n_pad]). Empty clusters keep their
    previous centroid (they stay empty; adjacency just never picks them).

    Packed metrics cluster in the unpacked {0, 1} space: centroids are
    continuous bit-probability vectors (f32 [C, D_pad]) and assignment is
    by squared euclidean — which equals expected hamming distance to the
    centroid's cluster, and every packed metric is monotone in hamming,
    so the partition is the right one for all of them.
    """
    metric = distances.by_name(metric_name)
    C, D = centroids.shape
    packed = metric.is_packed
    cn = _centroid_norms(metric, centroids)
    n_pad = member_slots.shape[0]

    def body(i, state):
        sums, counts, assign = state
        sl = jax.lax.dynamic_slice(member_slots, (i * chunk,), (chunk,))
        ok = sl >= 0
        raw = vectors[jnp.maximum(sl, 0)]
        if packed:
            x = distances.unpack_bits(raw).astype(jnp.float32)
            dots = jnp.einsum("bd,cd->bc", x, centroids, preferred_element_type=jnp.float32)
            # |x|² is constant per row — argmin over c needs only c²-2xc
            # (c² is loop-invariant; XLA hoists it out of the fori_loop)
            c2 = jnp.einsum("cd,cd->c", centroids, centroids, preferred_element_type=jnp.float32)
            d = c2[None, :] - 2.0 * dots
        else:
            x = raw.astype(jnp.float32)
            if distances.BULK_BF16 and metric.name in ("cosine", "euclidean"):
                # assignment needs only argmin over c — drop the per-row
                # constant terms and ride one bf16 MXU pass (f32 accum).
                # cosine: argmin (1-cos)/2 == argmax dot/cn; euclidean:
                # argmin |x|²+c²-2xc == argmin c²-2xc. bf16 flips only
                # near-tied assignments (same policy as pairwise_block).
                dots = jnp.einsum(
                    "bd,cd->bc", x.astype(jnp.bfloat16),
                    centroids.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                if metric.name == "cosine":
                    d = -dots / jnp.maximum(cn, 1.1920929e-07)[None, :]
                else:
                    c2 = jnp.einsum(
                        "cd,cd->c", centroids, centroids,
                        preferred_element_type=jnp.float32,
                    )
                    d = c2[None, :] - 2.0 * dots
            else:
                xn = norms[jnp.maximum(sl, 0)]
                d = distances.matrix_distances(metric, x, xn, centroids, cn)  # [chunk, C]
        a = jnp.argmin(d, axis=-1).astype(jnp.int32)
        oh = jax.nn.one_hot(a, C, dtype=jnp.float32) * ok[:, None]
        sums = sums + jnp.einsum(
            "bc,bd->cd", oh, x, preferred_element_type=jnp.float32
        )
        counts = counts + jnp.sum(oh, axis=0)
        assign = jax.lax.dynamic_update_slice(
            assign, jnp.where(ok, a, -1), (i * chunk,)
        )
        return sums, counts, assign

    sums = jnp.zeros((C, D), dtype=jnp.float32)
    counts = jnp.zeros((C,), dtype=jnp.float32)
    assign = jnp.full((n_pad,), -1, dtype=jnp.int32)
    sums, counts, assign = jax.lax.fori_loop(0, n_steps, body, (sums, counts, assign))
    new_c = sums / jnp.maximum(counts, 1.0)[:, None]
    new_c = jnp.where((counts > 0)[:, None], new_c, centroids)
    return new_c.astype(centroids.dtype), assign


def _centroid_norms(metric, centroids: jax.Array) -> jax.Array:
    if metric.name == "cosine":
        return jnp.sqrt(
            jnp.einsum("cd,cd->c", centroids.astype(jnp.float32), centroids.astype(jnp.float32))
        )
    return jnp.zeros((centroids.shape[0],), dtype=jnp.float32)


@partial(jax.jit, static_argnames=("C",))
def _maxmin_indices(geom: jax.Array, C: int) -> jax.Array:
    """Furthest-point (maxmin) selection of C rows from ``geom`` [S, D].

    One fori_loop on device: each step adds the row furthest (squared L2
    in geometry space) from every already-picked row. Previously picked
    rows carry min-distance 0 so they are never re-picked. O(C·S·D)
    matvec FLOPs — seconds at S=128k, C=4k, D=768 on one v5e.
    """
    S = geom.shape[0]
    if distances.BULK_BF16:
        # each step streams the whole sample from HBM — bf16 halves the
        # bandwidth of the selection loop; picks shift only for near-ties
        geom = geom.astype(jnp.bfloat16)
    g2 = jnp.einsum("sd,sd->s", geom, geom, preferred_element_type=jnp.float32)

    def body(j, state):
        min_d2, idxs = state
        last = geom[idxs[j - 1]]
        d2 = (
            g2
            - 2.0 * jnp.einsum("sd,d->s", geom, last, preferred_element_type=jnp.float32)
            + jnp.einsum("d,d->", last, last, preferred_element_type=jnp.float32)
        )
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2).astype(jnp.int32)
        return min_d2, idxs.at[j].set(nxt)

    idxs = jnp.zeros((C,), jnp.int32)  # pick 0 = row 0
    min_d2 = jnp.full((S,), jnp.inf)
    _, idxs = jax.lax.fori_loop(1, C, body, (min_d2, idxs))
    return idxs


def kmeans_partition(
    dev: DeviceGraph,
    member_slots: np.ndarray,  # [n] valid slot ids
    n_clusters: int,
    iters: int,
    rng: np.random.Generator,
    cancel=None,
    init: str = "maxmin",
    init_sample: int = 131072,
) -> np.ndarray:
    """Cluster member vectors on device → assignment [n] (host int32).

    ``init="maxmin"`` (default) picks centroids by furthest-point
    selection over a random member sample. Random-member init is the
    round-3 defect at scale: with fewer centroids than natural data
    components, ~e^-λ of the components get no centroid, and in high
    dimension an orphan component's points split across several
    near-equidistant foreign clusters whose blocks never see each other —
    measured at 1M×768 cosine: candidate recall@10 0.65 (vs 0.9995 at
    30k×64), which caps every downstream stage. Furthest-point selection
    covers well-separated components before refining anything (the same
    property kmeans++ targets, deterministic and one fused device loop).
    """
    from ..errors import BuildCancelled

    n = len(member_slots)
    slots_pad = jnp.asarray(
        _pad_to(member_slots.astype(np.int32), KMEANS_CHUNK, -1)
    )
    n_steps = slots_pad.shape[0] // KMEANS_CHUNK
    packed = dev.metric.is_packed
    if init == "maxmin":
        S = min(n, max(init_sample, 8 * n_clusters))
        sample = member_slots[rng.choice(n, size=S, replace=False)]
        sv = dev.vectors[jnp.asarray(sample.astype(np.int32))]
        if packed:
            geom = distances.unpack_bits(sv).astype(jnp.float32)
        else:
            geom = sv.astype(jnp.float32)
            if dev.metric.name == "cosine":
                # cosine geometry: maxmin on unit rows (L2 there is
                # monotone in cosine distance)
                nn = jnp.sqrt(jnp.einsum("sd,sd->s", geom, geom))
                geom = geom / jnp.maximum(nn, 1e-30)[:, None]
        picks = _maxmin_indices(geom, n_clusters)
        if packed:
            centroids = distances.unpack_bits(sv[picks]).astype(jnp.float32)
        else:
            centroids = sv[picks].astype(jnp.float32)
    else:
        init_rows = member_slots[rng.choice(n, size=n_clusters, replace=False)]
        centroids = dev.vectors[jnp.asarray(init_rows.astype(np.int32))]
        if packed:
            # packed rows cluster in the unpacked {0,1} space (_kmeans_step)
            centroids = distances.unpack_bits(centroids).astype(jnp.float32)
    assign = None
    for _ in range(max(1, iters)):
        if cancel is not None and cancel():
            raise BuildCancelled()
        centroids, assign = _kmeans_step(
            dev.vectors, dev.norms, slots_pad, centroids,
            metric_name=dev.metric_name, n_steps=n_steps, chunk=KMEANS_CHUNK,
        )
    return np.asarray(assign)[:n]


# --------------------------------------------------------------------------
# Candidate generation
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("metric_name", "K", "n_steps", "chunk"))
def _brute_candidates_jit(
    vectors, norms, member_slots, metric_name: str, K: int, n_steps: int, chunk: int
):
    """Exact kNN candidates for a (small) member set: chunked [chunk, M]
    distance matrices + top-K. Output aligned with member positions."""
    metric = distances.by_name(metric_name)
    n_pad = member_slots.shape[0]
    mvec = vectors[jnp.maximum(member_slots, 0)]
    mnrm = norms[jnp.maximum(member_slots, 0)]
    col_ok = member_slots >= 0

    out_ids = jnp.full((n_pad, K), NO_ID, dtype=jnp.int32)
    out_d = jnp.full((n_pad, K), INF)

    def body(i, out):
        out_ids, out_d = out
        p0 = i * chunk
        sl = jax.lax.dynamic_slice(member_slots, (p0,), (chunk,))
        q = jax.lax.dynamic_slice(mvec, (p0, 0), (chunk, mvec.shape[1]))
        qn = jax.lax.dynamic_slice(mnrm, (p0,), (chunk,))
        if metric.is_packed:
            # MXU popcount-as-dot (exact): the member set is bounded by
            # BRUTE_MAX so unpacking both operands is cheap, and the dense
            # dot replaces a [chunk, M, W] XOR-popcount broadcast
            d = distances.packed_matrix_mxu(metric, q, qn, mvec, mnrm)
        else:
            d = distances.matrix_distances(metric, q, qn, mvec, mnrm)  # [chunk, M]
        d = jnp.where(col_ok[None, :], d, INF)
        # exclude self by position
        pos = p0 + jnp.arange(chunk, dtype=jnp.int32)
        d = jnp.where(jnp.arange(n_pad, dtype=jnp.int32)[None, :] == pos[:, None], INF, d)
        neg, idx = jax.lax.top_k(-d, K)
        cids = jnp.where(jnp.isfinite(-neg), member_slots[idx], NO_ID)
        rows = jnp.where(sl >= 0, pos, n_pad)
        out_ids = out_ids.at[rows].set(cids, mode="drop")
        out_d = out_d.at[rows].set(-neg, mode="drop")
        return out_ids, out_d

    return jax.lax.fori_loop(0, n_steps, body, (out_ids, out_d))


@partial(jax.jit, static_argnames=("n_pad", "metric_name", "K", "G", "n_steps"))
def _cluster_candidates_jit(
    vectors,
    norms,
    tab_slots,  # [Cp, S] member slot ids per pseudo-cluster (-1 pad)
    tab_pos,  # [Cp, S] member positions (into the member list)
    adj,  # [Cp, A] adjacent pseudo-cluster ids (-1 pad)
    n_pad: int,  # rows in the output tables
    metric_name: str,
    K: int,
    G: int,
    n_steps: int,
):
    """Top-K candidates per member from its cluster's adjacency block.

    One fori step processes G clusters: gather the G row blocks and their
    A adjacent column blocks, one batched [G, S, A·S] distance einsum on
    the MXU, top-K per row, scatter into position-indexed output. This is
    the op that replaces the wave builder's per-hop row gathers.
    """
    metric = distances.by_name(metric_name)
    Cp, S = tab_slots.shape
    A = adj.shape[1]
    out_ids = jnp.full((n_pad, K), NO_ID, dtype=jnp.int32)
    out_d = jnp.full((n_pad, K), INF)
    # closest boundary pair per (cluster, adjacent cluster) — the layer-0
    # connectivity edges (see _force_cross_links)
    x_src = jnp.full((Cp, A), NO_ID, dtype=jnp.int32)
    x_dst = jnp.full((Cp, A), NO_ID, dtype=jnp.int32)
    x_d = jnp.full((Cp, A), INF)

    def body(i, out):
        out_ids, out_d, x_src, x_dst, x_d = out
        c0 = i * G
        sl = jax.lax.dynamic_slice(tab_slots, (c0, 0), (G, S))  # [G, S]
        pos = jax.lax.dynamic_slice(tab_pos, (c0, 0), (G, S))
        ac = jax.lax.dynamic_slice(adj, (c0, 0), (G, A))  # [G, A]
        cols = tab_slots[jnp.maximum(ac, 0)]  # [G, A, S]
        cols = jnp.where((ac >= 0)[:, :, None], cols, NO_ID).reshape(G, A * S)
        q = vectors[jnp.maximum(sl, 0)]
        qn = norms[jnp.maximum(sl, 0)]
        v = vectors[jnp.maximum(cols, 0)]
        vn = norms[jnp.maximum(cols, 0)]
        d = distances.block_distances(metric, q, qn, v, vn)  # [G, S, A*S]
        d = jnp.where((cols >= 0)[:, None, :], d, INF)
        d = jnp.where(cols[:, None, :] == sl[:, :, None], INF, d)  # self
        d = jnp.where((sl >= 0)[:, :, None], d, INF)  # padded rows
        if CAND_APPROX:
            # TPU-optimized binned top-k (same trade as the flat routing
            # path's _FLAT_APPROX_MIN_U switch — deterministic, ~4x faster
            # at these shapes); candidate lists lose only near-tie tails
            neg, idx = jax.lax.approx_max_k(
                -d.reshape(G * S, A * S), K, recall_target=0.95
            )
        else:
            neg, idx = jax.lax.top_k(-d.reshape(G * S, A * S), K)
        flat_cols = jnp.repeat(cols, S, axis=0).reshape(G * S, A * S)
        cids = jnp.take_along_axis(flat_cols, idx, axis=-1)
        cids = jnp.where(jnp.isfinite(-neg), cids, NO_ID)
        rows = jnp.where(sl.reshape(-1) >= 0, pos.reshape(-1), n_pad)
        out_ids = out_ids.at[rows].set(cids, mode="drop")
        out_d = out_d.at[rows].set(-neg, mode="drop")

        # boundary pairs: argmin over the [S, S] sub-block per adjacency
        d4 = jnp.transpose(d.reshape(G, S, A, S), (0, 2, 1, 3))  # [G, A, S, S]
        am = jnp.argmin(d4.reshape(G, A, S * S), axis=-1)
        bd = jnp.min(d4.reshape(G, A, S * S), axis=-1)
        bsrc = jnp.take_along_axis(sl, am // S, axis=-1)  # [G, A]
        bdst = jnp.take_along_axis(
            cols.reshape(G, A, S), (am % S)[:, :, None], axis=-1
        )[:, :, 0]
        own = c0 + jnp.arange(G, dtype=ac.dtype)
        alien = (ac != own[:, None]) & (ac >= 0) & jnp.isfinite(bd)
        bsrc = jnp.where(alien, bsrc, NO_ID)
        bdst = jnp.where(alien, bdst, NO_ID)
        grows = jnp.minimum(c0 + jnp.arange(G), Cp - 1)
        x_src = jax.lax.dynamic_update_slice(x_src, bsrc, (c0, 0))
        x_dst = jax.lax.dynamic_update_slice(x_dst, bdst, (c0, 0))
        x_d = jax.lax.dynamic_update_slice(x_d, jnp.where(alien, bd, INF), (c0, 0))
        del grows
        return out_ids, out_d, x_src, x_dst, x_d

    return jax.lax.fori_loop(
        0, n_steps, body, (out_ids, out_d, x_src, x_dst, x_d)
    )


@partial(jax.jit, static_argnames=("metric_name", "n_steps", "chunk"))
def _random_candidates_jit(
    vectors, norms, member_slots, rand_slots, metric_name: str, n_steps: int, chunk: int
):
    """Distances from each member to R random members → [n_pad, R].

    Long-edge candidates: an insertion-order build links early items
    across the whole space while the graph is sparse, and those long
    edges are what lets a layer-0 beam recover from an imperfect descent
    seed. A pure-kNN layer has none (measured 30k×64 clustered: recall
    plateaus ~0.97 at every ef while an oracle seed scores 0.997). A few
    random-member candidates per item restore the NSW-style long-range
    wiring; the α-prune keeps only the ones no closer selected neighbor
    covers."""
    metric = distances.by_name(metric_name)
    R = rand_slots.shape[1]
    out_d = jnp.full((member_slots.shape[0], R), INF)

    def body(i, out_d):
        p0 = i * chunk
        sl = jax.lax.dynamic_slice(member_slots, (p0,), (chunk,))
        rs = jax.lax.dynamic_slice(rand_slots, (p0, 0), (chunk, R))
        q = vectors[jnp.maximum(sl, 0)]
        qn = norms[jnp.maximum(sl, 0)]
        v = vectors[jnp.maximum(rs, 0)]
        vn = norms[jnp.maximum(rs, 0)]
        d = distances.gathered_distances(metric, q, qn, v, vn)
        d = jnp.where((rs >= 0) & (rs != sl[:, None]) & (sl >= 0)[:, None], d, INF)
        return jax.lax.dynamic_update_slice(out_d, d, (p0, 0))

    return jax.lax.fori_loop(0, n_steps, body, out_d)


def _pseudo_cluster_tables(
    assign: np.ndarray,  # [n] cluster per member position
    n_clusters: int,
    s_cap: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split clusters into fixed-width pseudo-clusters.

    Clusters larger than ``s_cap`` split into chunks that share the parent
    centroid (centroid distance 0 → they pick each other as adjacency
    automatically). Returns (tab_pos [Cp, s_cap] member positions,
    parent [Cp] original cluster of each pseudo-cluster, order) where
    ``order`` is the member permutation sorted by (cluster, position) —
    the locality order used for slot renumbering.
    """
    order = np.argsort(assign, kind="stable")
    sizes = np.bincount(assign, minlength=n_clusters)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    tab_rows: list[np.ndarray] = []
    parents: list[int] = []
    for c in range(n_clusters):
        members = order[starts[c] : starts[c] + sizes[c]]
        for off in range(0, max(len(members), 1), s_cap):
            chunk = members[off : off + s_cap]
            row = np.full(s_cap, -1, dtype=np.int64)
            row[: len(chunk)] = chunk
            tab_rows.append(row)
            parents.append(c)
    return np.stack(tab_rows), np.asarray(parents, dtype=np.int64), order


@partial(jax.jit, static_argnames=("metric_name", "A"))
def _cluster_adjacency_jit(centroids, parent, metric_name: str, A: int):
    """Top-A nearest pseudo-clusters per pseudo-cluster (incl. self)."""
    metric = distances.by_name(metric_name)
    if metric.is_packed:
        # packed centroids are continuous bit-probability vectors in the
        # unpacked space (see _kmeans_step); euclidean between them is the
        # expected-hamming proxy every packed metric is monotone in
        metric = distances.EUCLIDEAN
    pc = centroids[parent]  # [Cp, D] pseudo-cluster centroids
    pn = _centroid_norms(metric, pc)
    d = distances.matrix_distances(metric, pc, pn, pc, pn)  # [Cp, Cp]
    # deterministic tie-break (siblings share a centroid): bias by index
    d = d + jnp.arange(d.shape[1], dtype=jnp.float32)[None, :] * 1e-9
    _, idx = jax.lax.top_k(-d, A)
    return idx.astype(jnp.int32)


def layer_candidates(
    dev: DeviceGraph,
    member_slots: np.ndarray,  # [n]
    K: int,
    opts,
    rng: np.random.Generator,
    cancel=None,
):
    """Candidate lists for one layer's members → (ids [n_pad, K],
    dists [n_pad, K], locality_order or None, cross_edges or None),
    position-aligned. ``cross_edges`` = (src, dst, d) closest boundary
    pairs per (cluster, adjacent cluster), the layer's connectivity
    edges."""
    n = len(member_slots)
    K = min(K, n - 1)
    if n <= BRUTE_MAX:
        chunk = min(4096, max(256, n))
        slots_pad = jnp.asarray(_pad_to(member_slots.astype(np.int32), chunk, -1))
        n_steps = slots_pad.shape[0] // chunk
        ids, d = _brute_candidates_jit(
            dev.vectors, dev.norms, slots_pad,
            metric_name=dev.metric_name, K=K, n_steps=n_steps, chunk=chunk,
        )
        return ids, d, None, None

    C = max(8, n // opts.bulk_cluster_size)
    with span("bulk_kmeans", n=n, clusters=C):
        assign = kmeans_partition(
            dev, member_slots, C, opts.bulk_kmeans_iters, rng, cancel=cancel,
            init=opts.bulk_init, init_sample=opts.bulk_init_sample,
        )
    s_cap = int(np.ceil(1.3 * n / C))
    tab_pos, parent, order = _pseudo_cluster_tables(assign, C, s_cap)
    Cp = tab_pos.shape[0]
    A = min(opts.bulk_adj, Cp)
    G = CAND_GROUP
    pad_rows = (-Cp) % G
    if pad_rows:
        tab_pos = np.concatenate(
            [tab_pos, np.full((pad_rows, s_cap), -1, dtype=np.int64)]
        )
        parent = np.concatenate([parent, np.zeros(pad_rows, dtype=np.int64)])
    tab_slots = np.where(tab_pos >= 0, member_slots[np.maximum(tab_pos, 0)], -1)

    # recompute centroids?: kmeans_partition's last step already moved
    # them; adjacency quality tolerates the one-step lag
    cent_idx = np.asarray(
        [row[row >= 0][0] if (row >= 0).any() else 0 for row in tab_slots]
    )
    # adjacency from representative members is noisy; use true centroids
    centroids = _segment_centroids(dev, member_slots, assign, C)
    adj_full = _cluster_adjacency_jit(
        centroids, jnp.asarray(parent.astype(np.int32)),
        metric_name=dev.metric_name, A=A,
    )
    adj = np.array(adj_full)  # copy — device views are read-only
    adj[Cp:] = -1  # padding rows select nothing
    del cent_idx

    with span("bulk_candidates", n=n, pseudo_clusters=Cp, s_cap=s_cap, adj=A):
        ids, d, x_src, x_dst, x_d = _cluster_candidates_jit(
            dev.vectors,
            dev.norms,
            jnp.asarray(tab_slots.astype(np.int32)),
            jnp.asarray(np.where(tab_pos >= 0, tab_pos, n).astype(np.int32)),
            jnp.asarray(adj.astype(np.int32)),
            n_pad=n,
            metric_name=dev.metric_name,
            K=K,
            G=G,
            n_steps=tab_pos.shape[0] // G,
        )
        from . import builder as _builder_mod

        if _builder_mod._FENCE_WAVES:
            jax.block_until_ready(d)
    return ids, d, order, (x_src.reshape(-1), x_dst.reshape(-1), x_d.reshape(-1))


@partial(jax.jit, static_argnames=("packed", "n_clusters", "n_steps", "chunk"))
def _segment_centroids_jit(
    vectors, member_slots, assign, packed: bool, n_clusters: int, n_steps: int, chunk: int
):
    D = vectors.shape[1] * (distances.codecs.LANE_BITS if packed else 1)

    def body(i, state):
        sums, counts = state
        sl = jax.lax.dynamic_slice(member_slots, (i * chunk,), (chunk,))
        a = jax.lax.dynamic_slice(assign, (i * chunk,), (chunk,))
        ok = sl >= 0
        raw = vectors[jnp.maximum(sl, 0)]
        if packed:
            x = distances.unpack_bits(raw).astype(jnp.float32)
        else:
            x = raw.astype(jnp.float32)
        oh = jax.nn.one_hot(jnp.where(ok, a, 0), n_clusters, dtype=jnp.float32) * ok[:, None]
        return (
            sums + jnp.einsum("bc,bd->cd", oh, x, preferred_element_type=jnp.float32),
            counts + jnp.sum(oh, axis=0),
        )

    sums = jnp.zeros((n_clusters, D), dtype=jnp.float32)
    counts = jnp.zeros((n_clusters,), dtype=jnp.float32)
    sums, counts = jax.lax.fori_loop(0, n_steps, body, (sums, counts))
    mean = sums / jnp.maximum(counts, 1.0)[:, None]
    return mean if packed else mean.astype(vectors.dtype)


def _segment_centroids(dev, member_slots, assign, n_clusters):
    slots_pad = jnp.asarray(_pad_to(member_slots.astype(np.int32), KMEANS_CHUNK, -1))
    assign_pad = jnp.asarray(_pad_to(assign.astype(np.int32), KMEANS_CHUNK, 0))
    return _segment_centroids_jit(
        dev.vectors, slots_pad, assign_pad, packed=dev.metric.is_packed,
        n_clusters=n_clusters, n_steps=slots_pad.shape[0] // KMEANS_CHUNK,
        chunk=KMEANS_CHUNK,
    )


# --------------------------------------------------------------------------
# Connect: prune + forward + reverse + inbound
# --------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("is_level0", "cap", "alpha", "K", "n_steps", "chunk"),
    donate_argnames=("g", "counters"),
)
def _connect_pass1_jit(
    g: DeviceGraph,
    member_slots,  # [n_pad] (-1 padded to chunk multiple)
    cand_ids,  # [n_pad(+1), K] position-aligned
    cand_d,
    level,  # traced scalar (read when not is_level0)
    counters,
    is_level0: bool,
    cap: int,
    alpha: float,
    K: int,
    n_steps: int,
    chunk: int,
):
    """α-prune every row's candidates → scatter forward rows, and return
    the pruned selections as position-aligned [n_pad, cap] tables.
    Forward writes are disjoint, so this pass has no ordering effects.
    The returned tables feed passes 2/3 explicitly: a row that later
    absorbs reverse edges must not re-emit them as its own selections
    (wave parity: a wave's reverse contributions come only from its
    α-pruned forward picks), and an explicit table keeps that invariant
    even when the host chunks the passes for cancellation probing."""
    metric = g.metric
    lvl = 0 if is_level0 else level
    n_pad = member_slots.shape[0]
    fwd_ids = jnp.full((n_pad, cap), NO_ID, dtype=jnp.int32)
    fwd_d = jnp.full((n_pad, cap), INF)

    def pass1(i, carry):
        links0, dists0, ul, ud, fwd_ids, fwd_d, counters = carry
        gc = wave_ops._replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud)
        p0 = i * chunk
        sl = jax.lax.dynamic_slice(member_slots, (p0,), (chunk,))
        cid = jax.lax.dynamic_slice(cand_ids, (p0, 0), (chunk, K))
        cd = jax.lax.dynamic_slice(cand_d, (p0, 0), (chunk, K))
        ok = sl >= 0
        cid = jnp.where(ok[:, None], cid, NO_ID)
        cd = jnp.where(ok[:, None], cd, INF)
        sel_ids, sel_d = prune.robust_prune(metric, g.vectors, g.norms, cid, cd, cap, alpha)
        gc = wave_ops._set_level_rows(gc, lvl, jnp.where(ok, sl, NO_ID), sel_ids, sel_d)
        fwd_ids = jax.lax.dynamic_update_slice(fwd_ids, sel_ids, (p0, 0))
        fwd_d = jax.lax.dynamic_update_slice(fwd_d, sel_d, (p0, 0))
        counters = counters.at[wave_ops.CNT_FWD_LINKS].add(
            jnp.sum(sel_ids != NO_ID, dtype=jnp.int32)
        )
        return gc.links0, gc.dists0, gc.upper_links, gc.upper_dists, fwd_ids, fwd_d, counters

    links0, dists0, ul, ud, fwd_ids, fwd_d, counters = jax.lax.fori_loop(
        0, n_steps, pass1,
        (g.links0, g.dists0, g.upper_links, g.upper_dists, fwd_ids, fwd_d, counters),
    )
    g = wave_ops._replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud)
    return g, fwd_ids, fwd_d, counters


@partial(
    jax.jit,
    static_argnames=("is_level0", "cap", "alpha", "n_steps", "chunk"),
    donate_argnames=("g", "dirty", "counters"),
)
def _connect_pass2_jit(
    g: DeviceGraph,
    member_slots,
    fwd_ids,  # [n_pad, cap] pass-1 selections, position-aligned
    fwd_d,
    level,
    dirty,
    counters,
    is_level0: bool,
    cap: int,
    alpha: float,
    n_steps: int,
    chunk: int,
):
    """Merge reverse edges chunk by chunk with the shared sorted-COO pass
    (add_link semantics, hnsw.rs:523-560)."""
    lvl = 0 if is_level0 else level

    def pass2(i, carry):
        links0, dists0, ul, ud, dirty, counters = carry
        gc = wave_ops._replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud)
        p0 = i * chunk
        sl = jax.lax.dynamic_slice(member_slots, (p0,), (chunk,))
        fi = jax.lax.dynamic_slice(fwd_ids, (p0, 0), (chunk, cap))
        fd = jax.lax.dynamic_slice(fwd_d, (p0, 0), (chunk, cap))
        gc, counters, u_dst = wave_ops.reverse_merge_edges(
            gc, lvl, sl, fi, fd, counters, cap, alpha
        )
        dirty = dirty.at[jnp.where(u_dst != NO_ID, u_dst, gc.capacity)].set(
            True, mode="drop"
        )
        return gc.links0, gc.dists0, gc.upper_links, gc.upper_dists, dirty, counters

    links0, dists0, ul, ud, dirty, counters = jax.lax.fori_loop(
        0, n_steps, pass2, (g.links0, g.dists0, g.upper_links, g.upper_dists, dirty, counters)
    )
    g = wave_ops._replace(g, links0=links0, dists0=dists0, upper_links=ul, upper_dists=ud)
    dirty = dirty.at[jnp.where(member_slots >= 0, member_slots, g.capacity)].set(
        True, mode="drop"
    )
    return g, dirty, counters


@partial(
    jax.jit,
    static_argnames=("is_level0", "cap", "alpha", "inc_cap"),
    donate_argnames=("g", "dirty", "counters"),
)
def _connect_pass2_global_jit(
    g: DeviceGraph,
    member_slots,
    fwd_ids,  # [n_pad, cap] pass-1 selections, position-aligned
    fwd_d,
    level,
    dirty,
    counters,
    is_level0: bool,
    cap: int,
    alpha: float,
    inc_cap: int,
):
    """Global reverse merge: one (dst, distance) sort over every reverse
    edge of the layer, each destination merged exactly once with its
    nearest ``inc_cap`` incoming edges (wave_ops.reverse_merge_edges_streamed
    — why-global rationale and the hnsw.rs:523-560 parity note live
    there). Replaces the chunked pass-2 fori for non-cancellable bulk
    builds: 42 s → single-digit seconds at 1M×768 (round-5 trace)."""
    lvl = 0 if is_level0 else level
    g, counters, u_dst = wave_ops.reverse_merge_edges_streamed(
        g, lvl, member_slots, fwd_ids, fwd_d, counters, cap, alpha, inc_cap
    )
    dirty = dirty.at[jnp.where(u_dst != NO_ID, u_dst, g.capacity)].set(
        True, mode="drop"
    )
    dirty = dirty.at[jnp.where(member_slots >= 0, member_slots, g.capacity)].set(
        True, mode="drop"
    )
    return g, dirty, counters


@partial(
    jax.jit,
    static_argnames=("cap", "n_steps", "chunk"),
    donate_argnames=("g", "dirty", "counters"),
)
def _connect_pass3_jit(
    g: DeviceGraph,
    member_slots,
    fwd_ids,
    fwd_d,
    dirty,
    counters,
    cap: int,
    n_steps: int,
    chunk: int,
):
    """Stranded-row repair (layer 0 only): the same bounded min-in-degree
    guarantee the wave path applies (``wave_ops._ensure_inbound``)."""

    def pass3(i, carry):
        links0, dists0, dirty, counters = carry
        gc = wave_ops._replace(g, links0=links0, dists0=dists0)
        p0 = i * chunk
        sl = jax.lax.dynamic_slice(member_slots, (p0,), (chunk,))
        fi = jax.lax.dynamic_slice(fwd_ids, (p0, 0), (chunk, cap))
        fd = jax.lax.dynamic_slice(fwd_d, (p0, 0), (chunk, cap))
        gc, dirty, counters = wave_ops._ensure_inbound(
            gc, sl, fi, fd, dirty, counters
        )
        return gc.links0, gc.dists0, dirty, counters

    links0, dists0, dirty, counters = jax.lax.fori_loop(
        0, n_steps, pass3, (g.links0, g.dists0, dirty, counters)
    )
    return wave_ops._replace(g, links0=links0, dists0=dists0), dirty, counters


#: host-probed steps per device dispatch when the build is cancellable
CANCEL_CONNECT_STEPS = 8

#: HANNOY_TPU_GLOBAL_MERGE (default on): non-cancellable bulk builds run
#: the reverse merge as ONE global sorted pass over all edges
#: (_connect_pass2_global_jit) instead of 4096-source chunks. =0 restores
#: the chunked pass for A/B.
GLOBAL_MERGE = _os.environ.get("HANNOY_TPU_GLOBAL_MERGE", "1") == "1"

#: HANNOY_TPU_CAND_APPROX (default ON since round 5): cluster-block
#: candidate top-K via lax.approx_max_k instead of exact lax.top_k
#: (bulk_candidates 9.4 s → 5.4 s at 1M×768). Chip A/B at 1M held
#: recall@10 at 0.9961 (benchmarks/logs/m1_flatbb_approx_r5.log vs
#: 0.9957 exact) — candidate recall is the quantity the round-4 collapse
#: taught us to guard, so =0 restores exact top-K for bisection.
CAND_APPROX = _os.environ.get("HANNOY_TPU_CAND_APPROX", "1") == "1"


def _bulk_connect(
    dev: DeviceGraph,
    slots_pad,  # np [n_pad] (-1 padded to chunk multiple)
    cand_ids,
    cand_d,
    level: int,
    dirty,
    counters,
    cap: int,
    alpha: float,
    K: int,
    chunk: int,
    cancel=None,
):
    """Drive the three connect passes. When ``cancel`` is set the passes
    run in ``CANCEL_CONNECT_STEPS``-step device dispatches with a host
    probe between each (the reference probes its insert loop every
    CANCELLATION_PROBING=10000 ops, hnsw.rs:174-177); pass boundaries
    keep wave parity regardless of chunking because pass 2/3 read the
    pass-1 selections from explicit tables."""
    from ..errors import BuildCancelled

    n_pad = slots_pad.shape[0]
    n_steps = n_pad // chunk
    is_level0 = level == 0
    member_j = jnp.asarray(slots_pad)
    lvl_j = jnp.int32(level)

    if cancel is None:
        from . import builder as _builder_mod

        fence = _builder_mod._FENCE_WAVES
        with span("connect_pass1", level=level, n=n_pad, K=K):
            dev, fwd_ids, fwd_d, counters = _connect_pass1_jit(
                dev, member_j, cand_ids, cand_d, lvl_j, counters,
                is_level0=is_level0, cap=cap, alpha=alpha, K=K,
                n_steps=n_steps, chunk=chunk,
            )
            if fence:
                jax.block_until_ready(counters)
        with span("connect_pass2", level=level, n=n_pad, glob=int(GLOBAL_MERGE)):
            if GLOBAL_MERGE:
                dev, dirty, counters = _connect_pass2_global_jit(
                    dev, member_j, fwd_ids, fwd_d, lvl_j, dirty, counters,
                    is_level0=is_level0, cap=cap, alpha=alpha, inc_cap=cap,
                )
            else:
                dev, dirty, counters = _connect_pass2_jit(
                    dev, member_j, fwd_ids, fwd_d, lvl_j, dirty, counters,
                    is_level0=is_level0, cap=cap, alpha=alpha,
                    n_steps=n_steps, chunk=chunk,
                )
            if fence:
                jax.block_until_ready(counters)
        if is_level0:
            with span("connect_pass3", n=n_pad):
                dev, dirty, counters = _connect_pass3_jit(
                    dev, member_j, fwd_ids, fwd_d, dirty, counters,
                    cap=cap, n_steps=n_steps, chunk=chunk,
                )
                if fence:
                    jax.block_until_ready(counters)
        return dev, dirty, counters

    # cancellable: slice the member range into fixed-shape groups so the
    # jitted passes compile once (the tail group is padded with -1
    # members, which every pass already masks out)
    group = min(CANCEL_CONNECT_STEPS, n_steps)
    n_groups = (n_steps + group - 1) // group
    gw = group * chunk
    tot = n_groups * gw
    if cand_ids.shape[0] < tot:
        extra = tot - int(cand_ids.shape[0])
        cand_ids = jnp.concatenate(
            [cand_ids, jnp.full((extra, K), NO_ID, dtype=jnp.int32)]
        )
        cand_d = jnp.concatenate([cand_d, jnp.full((extra, K), INF)])

    fwd_all = []
    for i in range(n_groups):
        if cancel():
            raise BuildCancelled()
        p0 = i * gw
        sl = np.full(gw, -1, dtype=np.int32)
        end = min(n_pad, p0 + gw)
        sl[: end - p0] = slots_pad[p0:end]
        sl_j = jnp.asarray(sl)
        ci = jax.lax.dynamic_slice(cand_ids, (p0, 0), (gw, K))
        cd = jax.lax.dynamic_slice(cand_d, (p0, 0), (gw, K))
        dev, fi, fd, counters = _connect_pass1_jit(
            dev, sl_j, ci, cd, lvl_j, counters,
            is_level0=is_level0, cap=cap, alpha=alpha, K=K,
            n_steps=group, chunk=chunk,
        )
        fwd_all.append((sl_j, fi, fd))
    for sl_j, fi, fd in fwd_all:
        if cancel():
            raise BuildCancelled()
        dev, dirty, counters = _connect_pass2_jit(
            dev, sl_j, fi, fd, lvl_j, dirty, counters,
            is_level0=is_level0, cap=cap, alpha=alpha,
            n_steps=group, chunk=chunk,
        )
    if is_level0:
        for sl_j, fi, fd in fwd_all:
            if cancel():
                raise BuildCancelled()
            dev, dirty, counters = _connect_pass3_jit(
                dev, sl_j, fi, fd, dirty, counters,
                cap=cap, n_steps=group, chunk=chunk,
            )
    return dev, dirty, counters


@partial(
    jax.jit,
    static_argnames=("is_level0", "force_cap"),
    donate_argnames=("g", "dirty", "counters"),
)
def _force_cross_links_jit(
    g: DeviceGraph,
    src: jax.Array,  # [E] boundary sources (-1 padded)
    dst: jax.Array,  # [E]
    d: jax.Array,  # [E]
    level,
    dirty,
    counters,
    is_level0: bool,
    force_cap: int = 4,
):
    """Force the closest cross-cluster boundary pairs as edges (both
    directions), displacing each row's worst link.

    A pure-kNN layer of naturally clustered data decomposes into
    disconnected components (every point's top-K lives inside its
    cluster); an insertion-order build picks up long edges while the
    graph is sparse, so the reference never faces this. One guaranteed
    edge per (cluster, adjacent-cluster) pair restores the connectivity
    the hierarchy's greedy descent needs — measured at 30k×64 clustered
    cosine: recall@10 plateaued at 0.97 at every ef without these edges.
    Deterministic: ranks assigned by (source, distance) sort; at most
    ``force_cap`` forced columns per source row.
    """
    lvl = 0 if is_level0 else level
    s2 = jnp.concatenate([src, dst])
    t2 = jnp.concatenate([dst, src])
    dd = jnp.concatenate([d, d])
    ok = (s2 != NO_ID) & (t2 != NO_ID) & jnp.isfinite(dd)
    rows_now, _ = wave_ops._level_rows(g, lvl, jnp.where(ok, s2, NO_ID))
    present = jnp.any(rows_now == t2[:, None], axis=-1)
    ok = ok & ~present

    # dedup identical (src, dst) pairs, then rank edges by (src, distance)
    big = jnp.int32(2**30)
    key_s = jnp.where(ok, s2, big)
    ks, kt, kd = jax.lax.sort((key_s, t2, dd), dimension=0, num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), (ks[1:] == ks[:-1]) & (kt[1:] == kt[:-1])]
    )
    kt = jnp.where(dup, NO_ID, kt)
    ks = jnp.where(kt == NO_ID, big, ks)
    ks, kd, kt = jax.lax.sort((ks, kd, kt), dimension=0, num_keys=2)
    idx = jnp.arange(ks.shape[0], dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    rank = idx - jax.lax.cummax(jnp.where(first, idx, 0))
    keep = (ks < big) & (kt != NO_ID) & (rank < force_cap)

    tw = g.links0.shape[-1] if is_level0 else g.upper_links.shape[-1]
    col = tw - 1 - jnp.where(keep, rank, 0)
    touched = jnp.where(keep, ks, NO_ID)
    if is_level0:
        safe_src = jnp.where(keep, ks, g.capacity)
        links0 = g.links0.at[safe_src, col].set(kt, mode="drop")
        dists0 = g.dists0.at[safe_src, col].set(kd, mode="drop")
        t_ids = links0[jnp.maximum(touched, 0)]
        t_d = dists0[jnp.maximum(touched, 0)]
        from ..ops import topk

        t_d, t_ids = topk.sort_by_dist(t_d, t_ids)
        links0 = wave_ops._scatter_rows(links0, touched, t_ids)
        dists0 = wave_ops._scatter_rows(dists0, touched, t_d)
        g = wave_ops._replace(g, links0=links0, dists0=dists0)
    else:
        l = level - 1
        U = g.upper_links.shape[1]
        rr = jnp.take(g.slot_rows, l, axis=0)[jnp.maximum(jnp.where(keep, ks, 0), 0)]
        rr = jnp.where(keep & (rr >= 0), rr, U)
        ul = g.upper_links.at[l, rr, col].set(kt, mode="drop")
        ud = g.upper_dists.at[l, rr, col].set(kd, mode="drop")
        t_ids = ul[l, jnp.minimum(rr, U - 1)]
        t_d = ud[l, jnp.minimum(rr, U - 1)]
        from ..ops import topk

        t_d, t_ids = topk.sort_by_dist(t_d, t_ids)
        ul = ul.at[l, jnp.where(rr < U, rr, U)].set(t_ids, mode="drop")
        ud = ud.at[l, jnp.where(rr < U, rr, U)].set(t_d, mode="drop")
        g = wave_ops._replace(g, upper_links=ul, upper_dists=ud)

    dirty = dirty.at[jnp.where(touched != NO_ID, touched, g.capacity)].set(
        True, mode="drop"
    )
    counters = counters.at[wave_ops.CNT_FWD_LINKS].add(jnp.sum(keep, dtype=jnp.int32))
    return g, dirty, counters


# --------------------------------------------------------------------------
# Entry point
# --------------------------------------------------------------------------


def bulk_build(
    g_host,
    dev: DeviceGraph,
    slots: np.ndarray,
    lvls: np.ndarray,
    opts,
    dirty: jax.Array,
    counters: jax.Array,
    top_level: int = 0,
    cancel=None,
    connect_mask: Optional[np.ndarray] = None,
) -> tuple[DeviceGraph, jax.Array, jax.Array, Optional[np.ndarray]]:
    """Build layers ``top_level..0`` of a fresh index from candidate lists.

    Levels above ``top_level`` are built by the insertion waves in
    ``builder.build_graph`` *before* this runs — the topmost (tiny)
    routing layers come out best insertion-shaped, and they cost almost
    nothing there. Mid layers (level 1 at 100k has ~N/M members) are
    where narrow waves burn dispatch round trips, and their members are
    few enough for exact brute-force kNN candidates (``BRUTE_MAX``), so
    the same candidates→α-prune→reverse-merge recipe builds them in a
    handful of device programs. Forced cross-cluster boundary edges +
    NSW random long-edge candidates keep every bulk layer navigable for
    the greedy ef=1 descent (see _force_cross_links_jit).

    Returns (dev, dirty, counters, order) — ``order`` is the layer-0
    locality permutation (member positions sorted by cluster) for the
    optional slot renumbering, or None if layer 0 used brute force.

    ``connect_mask`` (bool, aligned with ``slots``): when set, only True
    rows receive forward rows / reverse merges / inbound repair — the
    backbone mode: level>=1 members were already wave-inserted at layer 0
    with insertion-order long edges, and overwriting their rows with
    kNN-block selections would destroy exactly the escape edges the
    backbone exists for. All members still participate in clustering and
    as candidate columns, and leaf reverse merges still extend backbone
    rows (robust_prune keeps uncovered long edges on overflow).
    """
    rng = np.random.default_rng(opts.seed + 0x6B)
    K = opts.bulk_k or max(opts.ef_construction, g_host.m0 + 16)
    # Pure-kNN candidate lists lack the longer edges an insertion-order
    # build picks up while the graph is sparse, and at α=1.0 the prune
    # rejects most of a tight list (measured 8k×64: recall@10 plateaus at
    # 0.953 vs the wave path's 0.997). A mildly diverse prune restores
    # navigability: α=1.1 → 0.9996 at ef=50 (beats the wave build) at
    # ~19 links/row; 1.2 → 1.0 but ~25 links/row. Default 1.1 when the
    # caller kept the reference's α=1.0 default.
    if opts.bulk_alpha is not None:
        alpha = opts.bulk_alpha
    elif opts.alpha == 1.0:
        alpha = 1.1
    else:
        alpha = opts.alpha
    order0: Optional[np.ndarray] = None
    for level in range(top_level, -1, -1):
        members = slots[lvls >= level].astype(np.int64)
        if not len(members):
            continue
        cap = g_host.m0 if level == 0 else g_host.m
        if cancel is not None and cancel():
            from ..errors import BuildCancelled

            raise BuildCancelled()
        with span("bulk_layer", level=level, members=len(members)):
            cand_ids, cand_d, order, cross = layer_candidates(
                dev, members, K, opts, rng, cancel=cancel
            )
            if level == 0:
                order0 = order
            n = len(members)
            if opts.bulk_rand and n > 4 * K:
                # NSW-style long-edge candidates (see _random_candidates_jit)
                R = opts.bulk_rand
                rand_pos = rng.integers(0, n, size=(n, R))
                rand_slots = members[rand_pos].astype(np.int32)
                chunk_r = 8192
                mem_pad = _pad_to(members.astype(np.int32), chunk_r, -1)
                rs_pad = _pad_to(rand_slots, chunk_r, -1)
                rd = _random_candidates_jit(
                    dev.vectors, dev.norms, jnp.asarray(mem_pad), jnp.asarray(rs_pad),
                    metric_name=dev.metric_name, n_steps=len(mem_pad) // chunk_r,
                    chunk=chunk_r,
                )
                from ..ops import topk as _topk

                cand_ids = jnp.concatenate(
                    [cand_ids[:n], jnp.asarray(rs_pad[:n])], axis=1
                )
                cand_d = jnp.concatenate([cand_d[:n], rd[:n]], axis=1)
                cand_d, cand_ids = _topk.sort_by_dist(cand_d, cand_ids)
            members_c = members
            if connect_mask is not None:
                conn = connect_mask[lvls >= level]
                pos = np.nonzero(conn)[0]
                if not len(pos):
                    continue
                members_c = members[pos]
                sel = jnp.asarray(pos.astype(np.int32))
                cand_ids = cand_ids[sel]
                cand_d = cand_d[sel]
            chunk = min(CONNECT_CHUNK, max(256, len(members_c)))
            slots_pad = _pad_to(members_c.astype(np.int32), chunk, -1)
            Kc = int(cand_ids.shape[1])
            # pad candidate tables to the padded member count (position
            # n_pad.. are dropped rows)
            n_pad = slots_pad.shape[0]
            if cand_ids.shape[0] < n_pad + 1:
                extra = n_pad + 1 - cand_ids.shape[0]
                cand_ids = jnp.concatenate(
                    [cand_ids, jnp.full((extra, Kc), NO_ID, dtype=jnp.int32)]
                )
                cand_d = jnp.concatenate([cand_d, jnp.full((extra, Kc), INF)])
            dev, dirty, counters = _bulk_connect(
                dev,
                slots_pad,
                cand_ids,
                cand_d,
                level,
                dirty,
                counters,
                cap=cap,
                alpha=alpha,
                K=Kc,
                chunk=chunk,
                cancel=cancel,
            )
            if cross is not None:
                dev, dirty, counters = _force_cross_links_jit(
                    dev, cross[0], cross[1], cross[2], jnp.int32(level),
                    dirty, counters, is_level0=(level == 0),
                )
    return dev, dirty, counters, order0
