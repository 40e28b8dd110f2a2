"""Micro-profile one routing-layer tri wave on the chip, ablated.

Stages a 100k-capacity graph with a level-1 layer of U members, then
times wave_insert_level at level 1 (W=4096, flat triangular candidates)
and its legs separately, to find where the measured ~6 s/wave goes.

Usage: PYTHONPATH=... python scripts/check_upper_micro.py [W] [U] [D]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hannoy_tpu.build import wave_ops
from hannoy_tpu.models.hnsw import HostGraph, slot_capacity, to_device
from hannoy_tpu.ops import codecs, distances, prune

W = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
U = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
D = int(sys.argv[3]) if len(sys.argv) > 3 else 768
EF = 48
N = 100_000

rng = np.random.default_rng(0)
metric = distances.by_name("cosine")
g = HostGraph.empty(metric, D, 16, 32, capacity=slot_capacity(N))
for i in range(N):
    g.alloc_slot(i)
data = rng.standard_normal((N, D)).astype(np.float32)
g.vectors[:N] = codecs.pack(data, metric.codec)
g.norms[:N] = distances.np_norms(metric, g.vectors[:N])
g.ensure_layers(1)
members = rng.permutation(N)[: U - 64].astype(np.int64)
for s in members:
    g.upper_row(1, int(s))
g.levels[members] = 1
dev = to_device(g)

tab = np.full(U, -1, dtype=np.int32)
tab[: len(members)] = members
tab_j = jnp.asarray(tab)
order = np.full(U, 2**30, dtype=np.int32)
order[: len(members)] = np.arange(len(members))
order_j = jnp.asarray(order)

wave = members[:W].astype(np.int32)
wave_j = jnp.asarray(wave)
node_ok = jnp.asarray(g.levels >= 0)
row_base = jnp.int32(0)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.1f} ms", flush=True)


@jax.jit
def full_wave(dev, wave_j, tab_j, order_j, row_base, node_ok):
    res = wave_ops.wave_insert_level(
        dev, wave_j, level=1, is_level0=False, node_ok=node_ok,
        seeds=jnp.broadcast_to(wave_j[:1], (W, 1)),
        ef=EF, cap=dev.upper_links.shape[-1], alpha=1.0,
        flat_members=tab_j, flat_col_order=order_j, flat_row_base=row_base,
    )
    return res.graph.upper_links


@jax.jit
def cands_only(dev, wave_j, tab_j, order_j, row_base):
    q = dev.vectors[jnp.maximum(wave_j, 0)]
    qn = dev.norms[jnp.maximum(wave_j, 0)]
    mvec = dev.vectors[jnp.maximum(tab_j, 0)]
    mnrm = dev.norms[jnp.maximum(tab_j, 0)]
    d_mat = distances.matrix_distances(metric, q, qn, mvec, mnrm)
    row_ord = row_base + jnp.arange(W, dtype=jnp.int32)
    d_mat = jnp.where(order_j[None, :] < row_ord[:, None], d_mat, jnp.inf)
    neg, idx = jax.lax.top_k(-d_mat, EF)
    return jnp.where(jnp.isfinite(-neg), tab_j[idx], -1), -neg


@jax.jit
def prune_only(dev, cand_ids, cand_d):
    return prune.robust_prune(
        metric, dev.vectors, dev.norms, cand_ids, cand_d,
        dev.upper_links.shape[-1], 1.0,
    )


@jax.jit
def reverse_only(dev, wave_j, sel_ids, sel_d):
    counters = jnp.zeros((4,), dtype=jnp.int32)
    g2, counters, u_dst = wave_ops.reverse_merge_edges(
        dev, 1, wave_j, sel_ids, sel_d, counters,
        dev.upper_links.shape[-1], 1.0,
    )
    return g2.upper_links


print(f"W={W} U={U} D={D} ef={EF} cap={int(to_device(g).upper_links.shape[-1])}", flush=True)
cand_ids, cand_d = cands_only(dev, wave_j, tab_j, order_j, row_base)
sel_ids, sel_d = prune_only(dev, cand_ids, cand_d)
timeit("full wave_insert_level", full_wave, dev, wave_j, tab_j, order_j, row_base, node_ok)
timeit("candidates (matmul+mask+topk)", cands_only, dev, wave_j, tab_j, order_j, row_base)
timeit("robust_prune", prune_only, dev, cand_ids, cand_d)
timeit("reverse_merge_edges", reverse_only, dev, wave_j, sel_ids, sel_d)
