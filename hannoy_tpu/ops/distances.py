"""Distance layer: the seven metrics of the reference, batched for TPU.

Reference: ``/root/reference/src/distance/`` (trait at mod.rs:26-48) and the
SIMD kernels in ``src/spaces/`` (SURVEY §2.1 [native-perf] rows). All
distances return "smaller is closer" floats with exactly the reference's
formulas:

* ``cosine``       — ``(1 - cos)/2`` with cos clamped to [-1, 1]; 0.0 when
                     ``|p||q| <= eps`` (cosine.rs:40-56). Norm cached in the
                     item header.
* ``euclidean``    — **squared** L2, no sqrt (simple.rs:49-51).
* ``manhattan``    — ``Σ|p-q|`` (manhattan.rs:41-44).
* ``hamming``      — ``popcount(p^q) / padded_bits`` (hamming.rs:44-47).
* ``bq cosine``    — cosine over ±1 vectors; ``dot = Σ(ones-zeros)(~(p^q))``
                     per 64-bit word == ``D_pad - 2*popcount(p^q)``
                     (binary_quantized_cosine.rs, simple.rs:119-131).
* ``bq euclidean`` — ``4 * popcount(p^q)`` (binary_quantized_euclidean.rs).
* ``bq manhattan`` — ``2 * popcount(p^q)`` (binary_quantized_manhattan.rs).

Where the reference dispatches per-pair AVX/SSE/NEON kernels at runtime
(spaces/simple.rs:19-83), here every op is *batched*: XLA fuses the
gather→distance→reduce chain onto the VPU, and the brute-force matrix path
rides the MXU via matmul. Packed metrics use uint32 lanes +
``lax.population_count``.

The string names are DB-format identities used for the reader metric check
and the BQ-migration fast path (mod.rs:33-36, writer.rs:358-410) — they
must match the reference byte-for-byte.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import codecs
from .codecs import BINARY, BQ, F32

_EPS = np.float32(1.1920929e-07)  # f32::EPSILON

#: Matmul precision for f32 distance einsums. TPU MXUs default to bf16-ish
#: passes; HIGHEST keeps f32 distances exact (the gather-bound paths are
#: HBM-bandwidth-bound, so this costs little THERE — the bulk builder's
#: dense blocks are compute-bound and opt into one-pass bf16 below).
MATMUL_PRECISION = jax.lax.Precision.HIGHEST

#: HANNOY_TPU_BULK_BF16 (default ON since round 5): the bulk builder's
#: compute-bound dense blocks (candidate generation block_distances,
#: α-prune pairwise_block) run their f32 dot-metric matmuls as one bf16
#: MXU pass with f32 accumulate instead of HIGHEST's 3-6 passes.
#: Candidate lists and prune decisions shift only for near-ties;
#: search-path distances stay exact. A/B evidence: CPU 20k recall-
#: identical (round 4); 1M×768 chip A/B r@10 0.9957 vs 0.9953 at ef=50
#: (benchmarks/logs/m1_bf16on_r5.log vs results_r4.jsonl). Set =0 to
#: restore the HIGHEST-precision bulk path.
import os as _os

BULK_BF16 = _os.environ.get("HANNOY_TPU_BULK_BF16", "1") == "1"


@dataclass(frozen=True)
class Metric:
    """A distance metric (reference trait ``Distance``, mod.rs:26-48)."""

    name: str  # DB-stable string identity (D::name())
    codec: str  # which vector codec backs it

    @property
    def is_packed(self) -> bool:
        return self.codec != F32


COSINE = Metric("cosine", F32)
EUCLIDEAN = Metric("euclidean", F32)
MANHATTAN = Metric("manhattan", F32)
HAMMING = Metric("hamming", BINARY)
BQ_COSINE = Metric("binary quantized cosine", BQ)
BQ_EUCLIDEAN = Metric("binary quantized euclidean", BQ)
BQ_MANHATTAN = Metric("binary quantized manhattan", BQ)

ALL_METRICS = [COSINE, EUCLIDEAN, MANHATTAN, HAMMING, BQ_COSINE, BQ_EUCLIDEAN, BQ_MANHATTAN]
BY_NAME = {m.name: m for m in ALL_METRICS}


def by_name(name: str) -> Metric:
    return BY_NAME[name]


# --------------------------------------------------------------------------
# Headers / norms (host)
# --------------------------------------------------------------------------


def np_norms(metric: Metric, packed: np.ndarray) -> np.ndarray:
    """Per-item header scalar for a batch of packed rows → [B] float32.

    cosine → L2 norm; bq cosine → sqrt(bq_dot(v,v)) == sqrt(D_pad);
    hamming → popcount (parity with ``norm_no_header``, unused by search);
    others → 0.0 (the reference's unused ``bias``).
    """
    packed = np.atleast_2d(packed)
    if metric.name == "cosine":
        return np.sqrt(np.einsum("bd,bd->b", packed, packed, dtype=np.float64)).astype(np.float32)
    if metric.name == "binary quantized cosine":
        d_pad = packed.shape[1] * codecs.LANE_BITS
        return np.full(packed.shape[0], np.sqrt(np.float32(d_pad)), dtype=np.float32)
    if metric.name == "hamming":
        return _np_popcount_rows(packed).astype(np.float32)
    return np.zeros(packed.shape[0], dtype=np.float32)


def _np_popcount_rows(x: np.ndarray) -> np.ndarray:
    by = np.atleast_2d(x).astype("<u4").view(np.uint8)
    return np.unpackbits(by, axis=1).sum(axis=1)


# --------------------------------------------------------------------------
# Numpy reference implementation (oracle for tests + trusted host builder)
# --------------------------------------------------------------------------


def np_pairwise(
    metric: Metric,
    a: np.ndarray,
    a_norm: np.ndarray,
    b: np.ndarray,
    b_norm: np.ndarray,
) -> np.ndarray:
    """Exact [A, B] distance matrix between packed row batches (numpy)."""
    a = np.atleast_2d(a)
    b = np.atleast_2d(b)
    name = metric.name
    if name == "cosine":
        dots = a.astype(np.float32) @ b.astype(np.float32).T
        denom = np.outer(a_norm, b_norm)
        cos = np.clip(np.divide(dots, denom, out=np.zeros_like(dots), where=denom > _EPS), -1, 1)
        out = np.where(denom > _EPS, (1.0 - cos) / 2.0, 0.0)
        return out.astype(np.float32)
    if name == "euclidean":
        diff = a[:, None, :].astype(np.float32) - b[None, :, :].astype(np.float32)
        return np.einsum("abd,abd->ab", diff, diff).astype(np.float32)
    if name == "manhattan":
        return np.abs(a[:, None, :].astype(np.float32) - b[None, :, :]).sum(-1).astype(np.float32)
    # packed metrics
    xor = a[:, None, :] ^ b[None, :, :]
    pc = np.unpackbits(xor.astype("<u4").view(np.uint8).reshape(a.shape[0], b.shape[0], -1), axis=2).sum(
        axis=2
    )
    d_pad = a.shape[1] * codecs.LANE_BITS
    if name == "hamming":
        return (pc / np.float32(d_pad)).astype(np.float32)
    if name == "binary quantized euclidean":
        return (4.0 * pc).astype(np.float32)
    if name == "binary quantized manhattan":
        return (2.0 * pc).astype(np.float32)
    if name == "binary quantized cosine":
        dot = d_pad - 2.0 * pc
        denom = np.outer(a_norm, b_norm)
        cos = np.divide(dot, denom, out=np.zeros_like(dot, dtype=np.float64), where=denom != 0)
        return np.where(denom != 0, (1.0 - cos) / 2.0, 0.0).astype(np.float32)
    raise ValueError(f"unknown metric {name}")


# --------------------------------------------------------------------------
# Device implementations (jax.numpy; shapes static under jit)
# --------------------------------------------------------------------------


def _deq(rows: jax.Array, scale: jax.Array) -> jax.Array:
    """int8 capacity-tier rows → f32 via the per-row scale stored in the
    norm header (euclidean/manhattan int8 tier — models.hnsw.to_device).
    Other dtypes pass through unchanged; f32 queries carry scale 0 and
    never reach here as int8."""
    if rows.dtype == jnp.int8:
        return rows.astype(jnp.float32) * scale[..., None]
    return rows


def gathered_distances(
    metric: Metric,
    q: jax.Array,  # [B, D*] queries (packed lanes for packed codecs)
    q_norm: jax.Array,  # [B]
    c: jax.Array,  # [B, K, D*] gathered candidate rows
    c_norm: jax.Array,  # [B, K]
) -> jax.Array:
    """Distances between each query and its K gathered candidates → [B, K].

    This is the TPU replacement of the per-pair ``D::distance`` call in the
    beam-search hot loop (reference hnsw.rs:503, reader.rs:346-348): one
    fused VPU pass per hop instead of pointer-chasing SIMD calls.

    Rows may arrive as bfloat16 (the opt-in HBM storage dtype — halves the
    gather bandwidth of the hot loop): dot metrics run the MXU's native
    bf16×bf16→f32; the subtractive metrics upcast after the gather so the
    cancellation-sensitive arithmetic stays f32. int8 rows (the 4×
    capacity tier, see models.hnsw.to_device) dequantize after the
    gather: cosine folds the 127 scale into the norm header (it cancels in
    cos), euclidean/manhattan carry a true per-row scale there.
    """
    name = metric.name
    if c.dtype == jnp.int8:
        if name == "cosine":
            c = c.astype(jnp.float32)
        else:
            q = _deq(q, q_norm)
            c = _deq(c, c_norm)
    bf16 = c.dtype == jnp.bfloat16
    if name == "cosine":
        qq = q.astype(c.dtype)
        prec = None if bf16 else MATMUL_PRECISION
        dots = jnp.einsum("bd,bkd->bk", qq, c, preferred_element_type=jnp.float32, precision=prec)
        denom = q_norm[:, None] * c_norm
        cos = jnp.clip(dots / jnp.maximum(denom, _EPS), -1.0, 1.0)
        return jnp.where(denom > _EPS, (1.0 - cos) * 0.5, 0.0)
    if name == "euclidean":
        diff = q[:, None, :] - c.astype(jnp.float32)
        return jnp.einsum("bkd,bkd->bk", diff, diff, preferred_element_type=jnp.float32, precision=MATMUL_PRECISION)
    if name == "manhattan":
        return jnp.sum(jnp.abs(q[:, None, :] - c.astype(jnp.float32)), axis=-1)
    # packed codecs: uint32 lanes
    pc = jnp.sum(jax.lax.population_count(q[:, None, :] ^ c).astype(jnp.int32), axis=-1)
    d_pad = q.shape[-1] * codecs.LANE_BITS
    return _packed_from_popcount(name, pc, d_pad, q_norm[:, None] * c_norm)


def matrix_distances(
    metric: Metric,
    q: jax.Array,  # [B, D*]
    q_norm: jax.Array,  # [B]
    db: jax.Array,  # [N, D*]
    db_norm: jax.Array,  # [N]
) -> jax.Array:
    """Full [B, N] distance matrix — the brute-force / recall-oracle path.

    f32 dot-metrics ride the MXU. Euclidean uses the norm expansion
    ``|p|²+|q|²-2pq`` (clamped at 0) so it is also one big matmul; this is a
    documented deviation from the reference's cancellation-free elementwise
    kernel (spaces/simple.rs:47-51) — ranking-equivalent to ~1e-3 and only
    used where throughput matters.
    """
    name = metric.name
    if db.dtype == jnp.int8:
        if name == "cosine":
            db = db.astype(jnp.float32)
        else:
            q = _deq(q, q_norm)
            db = _deq(db, db_norm)
    bf16 = db.dtype == jnp.bfloat16
    prec = None if bf16 else MATMUL_PRECISION
    if name == "cosine":
        dots = jnp.einsum("bd,nd->bn", q.astype(db.dtype), db, preferred_element_type=jnp.float32, precision=prec)
        denom = q_norm[:, None] * db_norm[None, :]
        cos = jnp.clip(dots / jnp.maximum(denom, _EPS), -1.0, 1.0)
        return jnp.where(denom > _EPS, (1.0 - cos) * 0.5, 0.0)
    if name == "euclidean":
        dots = jnp.einsum("bd,nd->bn", q.astype(db.dtype), db, preferred_element_type=jnp.float32, precision=prec)
        q2 = jnp.einsum("bd,bd->b", q, q, preferred_element_type=jnp.float32, precision=MATMUL_PRECISION)
        n2 = jnp.einsum("nd,nd->n", db.astype(jnp.float32), db.astype(jnp.float32), preferred_element_type=jnp.float32, precision=prec)
        return jnp.maximum(q2[:, None] + n2[None, :] - 2.0 * dots, 0.0)
    if name == "manhattan":
        return jnp.sum(jnp.abs(q[:, None, :] - db[None, :, :].astype(jnp.float32)), axis=-1)
    pc = jnp.sum(
        jax.lax.population_count(q[:, None, :] ^ db[None, :, :]).astype(jnp.int32), axis=-1
    )
    d_pad = q.shape[-1] * codecs.LANE_BITS
    return _packed_from_popcount(name, pc, d_pad, q_norm[:, None] * db_norm[None, :])


def unpack_bits(x: jax.Array) -> jax.Array:
    """Unpack uint32 lanes → {0, 1} bfloat16 bits, LSB-first per lane
    (``[..., W] uint32 → [..., W*32] bfloat16``).

    The bridge from the packed codecs to the MXU: for any two bit rows,
    ``popcount(p ^ q) == pc(p) + pc(q) - 2·dot(bits_p, bits_q)``, and the
    dot of {0,1} bfloat16 vectors accumulated in f32 is EXACT (products
    are 0/1, sums stay far below 2^24) — so every packed metric's
    popcount, and therefore its distance formula, can ride a dense
    matmul instead of a [.., .., W]-materializing XOR broadcast.
    """
    shifts = jnp.arange(codecs.LANE_BITS, dtype=x.dtype)
    bits = (x[..., None] >> shifts) & x.dtype.type(1)
    return bits.reshape(*x.shape[:-1], x.shape[-1] * codecs.LANE_BITS).astype(jnp.bfloat16)


def _row_popcounts(x: jax.Array) -> jax.Array:
    """Total set bits per packed row → float32 [...]."""
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1).astype(jnp.float32)


def packed_matrix_mxu(
    metric: Metric,
    q: jax.Array,  # [B, W] packed lanes
    q_norm: jax.Array,  # [B]
    db: jax.Array,  # [N, W]
    db_norm: jax.Array,  # [N]
) -> jax.Array:
    """[B, N] packed-metric distances via one MXU matmul (exact).

    ``popcount(p^q) = pc(p) + pc(q) - 2·dot(bits)`` with the dot over
    unpacked {0,1} bf16 rows — see :func:`unpack_bits`. Used where both
    operands are bounded (bulk candidate generation); the streaming
    XOR-popcount path in :func:`matrix_distances` stays for
    arbitrarily large ``db`` (unpacking 10M×768 bits would cost 16× the
    packed HBM footprint)."""
    dots = jnp.einsum(
        "bd,nd->bn", unpack_bits(q), unpack_bits(db),
        preferred_element_type=jnp.float32,
    )
    pc = _row_popcounts(q)[:, None] + _row_popcounts(db)[None, :] - 2.0 * dots
    d_pad = q.shape[-1] * codecs.LANE_BITS
    return _packed_from_popcount(metric.name, pc, d_pad, q_norm[:, None] * db_norm[None, :])


def block_distances(
    metric: Metric,
    q: jax.Array,  # [G, S, D*] row blocks
    q_norm: jax.Array,  # [G, S]
    c: jax.Array,  # [G, T, D*] column blocks
    c_norm: jax.Array,  # [G, T]
) -> jax.Array:
    """Batched block distance matrices → [G, S, T].

    The bulk-construction hot op (build/bulk.py): distances between G
    cluster row-blocks and their adjacent-cluster column-blocks ride the
    MXU as one batched matmul — the whole point of the cluster-blocked
    builder is to turn the reference's per-pair pointer-chasing distance
    calls (hnsw.rs:503) into dense contraction the systolic array eats.

    Dot metrics use cosine / the euclidean norm expansion (same deviation
    note as :func:`matrix_distances`); the packed codecs unpack blocks to
    {0, 1} bf16 and ride the same batched matmul (exact — see
    :func:`unpack_bits`). f32 manhattan would materialize [G, S, T, D]
    and stays on the wave path.
    """
    name = metric.name
    if metric.is_packed:
        dots = jnp.einsum(
            "gsd,gtd->gst", unpack_bits(q), unpack_bits(c),
            preferred_element_type=jnp.float32,
        )
        pc = _row_popcounts(q)[:, :, None] + _row_popcounts(c)[:, None, :] - 2.0 * dots
        d_pad = q.shape[-1] * codecs.LANE_BITS
        return _packed_from_popcount(
            name, pc, d_pad, q_norm[:, :, None] * c_norm[:, None, :]
        )
    if c.dtype == jnp.int8:
        if name == "cosine":
            c = c.astype(jnp.float32)
        else:
            q = _deq(q, q_norm)
            c = _deq(c, c_norm)
    if BULK_BF16 and c.dtype == jnp.float32:
        # bulk candidate blocks: one bf16 MXU pass (see BULK_BF16 above)
        q = q.astype(jnp.bfloat16)
        c = c.astype(jnp.bfloat16)
    bf16 = c.dtype == jnp.bfloat16
    prec = None if bf16 else MATMUL_PRECISION
    if name == "cosine":
        dots = jnp.einsum(
            "gsd,gtd->gst", q.astype(c.dtype), c,
            preferred_element_type=jnp.float32, precision=prec,
        )
        denom = q_norm[:, :, None] * c_norm[:, None, :]
        cos = jnp.clip(dots / jnp.maximum(denom, _EPS), -1.0, 1.0)
        return jnp.where(denom > _EPS, (1.0 - cos) * 0.5, 0.0)
    if name == "euclidean":
        dots = jnp.einsum(
            "gsd,gtd->gst", q.astype(c.dtype), c,
            preferred_element_type=jnp.float32, precision=prec,
        )
        q2 = jnp.einsum("gsd,gsd->gs", q, q, preferred_element_type=jnp.float32, precision=MATMUL_PRECISION)
        c2 = jnp.einsum(
            "gtd,gtd->gt", c.astype(jnp.float32), c.astype(jnp.float32),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return jnp.maximum(q2[:, :, None] + c2[:, None, :] - 2.0 * dots, 0.0)
    raise ValueError(f"block_distances supports dot metrics only, got {name}")


def _packed_from_popcount(name: str, pc: jax.Array, d_pad: int, norm_prod: jax.Array) -> jax.Array:
    pc = pc.astype(jnp.float32)
    if name == "hamming":
        return pc / jnp.float32(d_pad)
    if name == "binary quantized euclidean":
        return 4.0 * pc
    if name == "binary quantized manhattan":
        return 2.0 * pc
    if name == "binary quantized cosine":
        dot = jnp.float32(d_pad) - 2.0 * pc
        cos = dot / jnp.where(norm_prod != 0, norm_prod, 1.0)
        return jnp.where(norm_prod != 0, (1.0 - cos) * 0.5, 0.0)
    raise ValueError(f"unknown packed metric {name}")


def device_dtype(metric: Metric):
    return jnp.uint32 if metric.is_packed else jnp.float32
