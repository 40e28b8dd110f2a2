"""Fused gather→distance Pallas kernel for beam-search hops.

The hot op of both search and construction is: for each query, fetch its
current node's M candidate rows from the HBM vector store and compute M
distances (SURVEY §7 translation table: "one fused Pallas
gather→distance→top-k kernel"). Pure-XLA executes this as a gather that
*materialises* ``[B, K, D]`` in HBM followed by a reduction pass — two
trips over the candidate bytes. This kernel DMAs each candidate row
HBM→VMEM once and reduces on the VPU, so candidate bytes cross HBM once.

Layout: Mosaic tiles 2-D HBM arrays (8, 128) and refuses single-row
slices, so the store is viewed as ``[N, D/128, 128]`` — the leading dim is
untiled and one logical vector row is a DMA-able block. Row indices ride
in scalar prefetch (SMEM); each grid step serves 8 queries.

Applies to f32 metrics with D a multiple of 128 (the packed codecs are a
few dozen uint32 lanes per row — too small for per-row DMAs to win);
everything else falls back to the XLA path, which remains the reference
implementation. Enable with ``HANNOY_TPU_PALLAS=1``.

Status (measured, see BENCH_NOTES.md round 2): the kernel is DMA-issue
bound at ~50 ns/row — at beam-hop shapes ([4096, 32] rows of 3 KB) that
is 6.6 ms/hop vs 5.5 ms for the XLA gather, which is HBM-trip bound at
nearly the same per-row floor. Neither path beats ~42 ns/row for random
single-row access; a fundamentally faster hop needs *fewer or larger*
row fetches (neighbor-block layouts), not a different gather kernel —
hence default-off. The standalone win (19× on isolated batches) comes
from XLA materialising [B, K, D] three HBM trips where the kernel does
one; inside the beam while_loop XLA fuses that margin away.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import distances

_EPS = 1.1920929e-07

#: queries handled per grid step (Mosaic wants >=8-row output blocks)
_QB = 8


def pallas_enabled() -> bool:
    return os.environ.get("HANNOY_TPU_PALLAS", "0") == "1"


def supports(metric: distances.Metric, d_star: int, dtype=None) -> bool:
    import jax.numpy as _jnp

    if dtype is not None and dtype != _jnp.float32:
        return False
    return (not metric.is_packed) and d_star % 128 == 0


def _reduction(metric_name: str, q, rows):
    """[C, 128] query tiles vs [K, C, 128] row tiles → [1, K] reduction.

    Stays rank-2 throughout — Mosaic's layout assignment rejects 1-D
    intermediates — by lane-reducing to [K, 128] then contracting the lane
    axis on the MXU with a ones vector."""
    if metric_name == "cosine":
        per_lane = jnp.sum(rows * q[None, :, :], axis=1)  # [K, 128]
    elif metric_name == "euclidean":
        diff = rows - q[None, :, :]
        per_lane = jnp.sum(diff * diff, axis=1)
    elif metric_name == "manhattan":
        per_lane = jnp.sum(jnp.abs(rows - q[None, :, :]), axis=1)
    else:
        raise ValueError(metric_name)
    ones = jnp.ones((128, 1), dtype=jnp.float32)
    red = jax.lax.dot_general(
        per_lane, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [K, 1]
    return jnp.transpose(red, (1, 0))  # [1, K]


def _gather_reduce_kernel(metric_name, K, idx_ref, q_ref, vec_hbm, out_ref, scratch, sems):
    """_QB queries per grid step: DMA their K rows each, reduce as they land.

    ``idx_ref`` is this step's [_QB, K] SMEM block (a whole-array scalar
    prefetch would exceed the 1 MB SMEM at build batch sizes — 4096×32
    indices is 2 MB of prefetched operand)."""
    for i in range(_QB):
        for j in range(K):
            row = jnp.maximum(idx_ref[i, j], 0)
            pltpu.make_async_copy(
                vec_hbm.at[row], scratch.at[i * K + j], sems.at[i * K + j]
            ).start()
    for i in range(_QB):
        for j in range(K):
            row = jnp.maximum(idx_ref[i, j], 0)
            pltpu.make_async_copy(
                vec_hbm.at[row], scratch.at[i * K + j], sems.at[i * K + j]
            ).wait()
        out_ref[i : i + 1, :] = _reduction(
            metric_name, q_ref[i], scratch[i * K : (i + 1) * K]
        )


@functools.partial(jax.jit, static_argnames=("metric_name",))
def fused_gather_reduce(
    metric_name: str,
    vectors: jax.Array,  # [N, D] HBM store, D % 128 == 0
    q: jax.Array,  # [B, D]
    idx: jax.Array,  # [B, K] row indices (-1 allowed; clamped, caller masks)
) -> jax.Array:
    """Raw per-candidate reduction → [B, K] float32 (dot / sqL2 / L1)."""
    B, K = idx.shape
    N, D = vectors.shape
    C = D // 128
    pad = (-B) % _QB
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
    Bp = B + pad
    vec3 = vectors.reshape(N, C, 128)
    q3 = q.reshape(Bp, C, 128)
    kernel = functools.partial(_gather_reduce_kernel, metric_name, K)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // _QB,),
        in_specs=[
            pl.BlockSpec((_QB, K), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_QB, C, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_QB, K), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_QB * K, C, 128), vectors.dtype),
            pltpu.SemaphoreType.DMA((_QB * K,)),
        ],
    )(idx, q3, vec3)
    return out[:B]


def gathered_distances_pallas(
    metric: distances.Metric,
    vectors: jax.Array,  # [N, D*]
    norms: jax.Array,  # [N]
    q: jax.Array,  # [B, D*]
    qn: jax.Array,  # [B]
    idx: jax.Array,  # [B, K]
) -> jax.Array:
    """Drop-in fused equivalent of
    ``distances.gathered_distances(metric, q, qn, vectors[idx], norms[idx])``.
    Falls back to the XLA path when the layout is unsupported."""
    if not supports(metric, vectors.shape[1], vectors.dtype):
        safe = jnp.maximum(idx, 0)
        return distances.gathered_distances(metric, q, qn, vectors[safe], norms[safe])
    raw = fused_gather_reduce(metric.name, vectors, q, idx)
    name = metric.name
    if name == "cosine":
        cn = norms[jnp.maximum(idx, 0)]
        denom = qn[:, None] * cn
        cos = jnp.clip(raw / jnp.maximum(denom, _EPS), -1.0, 1.0)
        return jnp.where(denom > _EPS, (1.0 - cos) * 0.5, 0.0)
    return raw
