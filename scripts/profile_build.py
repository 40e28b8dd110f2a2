"""Decompose the build hot loop on the real chip.

Measures, with dispatch overhead amortized by looping R reps inside one
jitted program and forcing a host transfer of the result (the axon remote
runtime's block_until_ready is not a reliable fence for scalar outputs):
  1. raw HBM copy bandwidth (reference ceiling)
  2. row-gather + distance (the per-hop candidate op), XLA vs Pallas
  3. merge_sorted (the per-hop pool merge)
  4. a full beam_search at construction shapes (per-iteration cost)
  5. a full wave_insert_level (adds prune + reverse merge)

Usage: python scripts/profile_build.py  (env: PROF_N, PROF_D, PROF_W)
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hannoy_tpu.build.builder import BuildOptions, build_graph
from hannoy_tpu.models.hnsw import HostGraph, slot_capacity, to_device
from hannoy_tpu.ops import beam, beam_pallas, codecs, distances, topk

N = int(os.environ.get("PROF_N", 100_000))
D = int(os.environ.get("PROF_D", 768))
W = int(os.environ.get("PROF_W", 4096))
M, M0 = 16, 32
EFC = int(os.environ.get("PROF_EFC", 48))
REPS = 20


def timeit(fn, *args, reps=3, **kw):
    """Best-of wall time; forces a host round trip on the result."""
    out = jax.device_get(fn(*args, **kw))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((N, D)).astype(np.float32)
    metric = distances.COSINE

    cap = slot_capacity(N)
    g = HostGraph.empty(metric, D, M, M0, capacity=cap)
    for i in range(N):
        g.alloc_slot(i)
    g.vectors[:N] = data
    g.norms[:N] = distances.np_norms(metric, data)

    print(f"N={N} D={D} W={W} cap={cap}", flush=True)

    # ---- 1. raw HBM copy bandwidth (body depends on i: no hoisting) ----
    big = jnp.asarray(rng.standard_normal((W * M0, D)).astype(np.float32))

    @jax.jit
    def copy_loop(x):
        def body(i, acc):
            return acc + x * (1.0 + i.astype(jnp.float32) * 1e-9)
        return jnp.sum(jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(x))[::997, ::97])

    t, _ = timeit(copy_loop, big)
    bytes_per = big.size * 4 * 3  # read x, read acc, write acc
    print(f"raw r+w stream: {bytes_per * REPS / t / 1e9:7.0f} GB/s ({t/REPS*1e3:.2f} ms per [{W*M0},{D}] pass)", flush=True)

    vecs = jnp.asarray(g.vectors)
    norms = jnp.asarray(g.norms)
    base_idx = jnp.asarray(rng.integers(0, N, size=(W, M0)).astype(np.int32))
    q = jnp.asarray(data[rng.integers(0, N, size=W)])
    qn = jnp.sqrt(jnp.sum(q * q, axis=-1))

    gb = W * M0 * D * 4 / 1e9

    # ---- 2. gather+distance: XLA ----
    @jax.jit
    def gather_xla_loop(vecs, norms, q, qn, idx):
        def body(i, acc):
            ii = (idx + i * 7919) % N
            vs = vecs[ii]
            ns = norms[ii]
            d = distances.gathered_distances(metric, q, qn, vs, ns)
            return acc + jnp.sum(d, axis=-1)
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((W,), jnp.float32))

    t, _ = timeit(gather_xla_loop, vecs, norms, q, qn, base_idx)
    print(f"gather+dist XLA:      {t/REPS*1e3:7.2f} ms/hop  -> {gb/(t/REPS):6.0f} GB/s effective", flush=True)

    # gather only (materialize [W,M0,D], reduce one lane)
    @jax.jit
    def gather_only_loop(vecs, idx):
        def body(i, acc):
            ii = (idx + i * 7919) % N
            return acc + jnp.sum(vecs[ii], axis=(1, 2))
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((W,), jnp.float32))

    t, _ = timeit(gather_only_loop, vecs, base_idx)
    print(f"gather only:          {t/REPS*1e3:7.2f} ms/hop  -> {gb/(t/REPS):6.0f} GB/s effective", flush=True)

    # ---- 2b. gather+distance: Pallas (standalone first, then in-loop) ----
    try:
        f = jax.jit(partial(beam_pallas.gathered_distances_pallas, metric))
        t, _ = timeit(f, vecs, norms, q, qn, base_idx)
        print(f"gather+dist Pallas (1-shot incl dispatch): {t*1e3:7.2f} ms", flush=True)

        @jax.jit
        def gather_pallas_loop(vecs, norms, q, qn, idx):
            def body(i, acc):
                ii = (idx + i * 7919) % N
                d = beam_pallas.gathered_distances_pallas(metric, vecs, norms, q, qn, ii)
                return acc + jnp.sum(d, axis=-1)
            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((W,), jnp.float32))

        t, _ = timeit(gather_pallas_loop, vecs, norms, q, qn, base_idx)
        print(f"gather+dist Pallas:   {t/REPS*1e3:7.2f} ms/hop  -> {gb/(t/REPS):6.0f} GB/s effective", flush=True)
    except Exception as e:
        print(f"pallas failed: {type(e).__name__}: {str(e)[:160]}", flush=True)

    # ---- 2c. bf16 variant ----
    vecs16 = vecs.astype(jnp.bfloat16)
    t, _ = timeit(gather_xla_loop, vecs16, norms, q, qn, base_idx)
    print(f"gather+dist XLA bf16: {t/REPS*1e3:7.2f} ms/hop  -> {gb/2/(t/REPS):6.0f} GB/s effective", flush=True)

    # ---- 2d. int8 variant (the traversal sketch encoding) ----
    mags = jnp.linalg.norm(vecs, axis=-1, keepdims=True)
    vecs8 = jnp.clip(jnp.round(127.0 * vecs / jnp.maximum(mags, 1e-30)), -127, 127).astype(jnp.int8)
    norms8 = jnp.full_like(norms, 127.0)
    q8 = q  # f32 queries vs int8 rows — the sketch-view path casts rows up
    t, _ = timeit(gather_xla_loop, vecs8, norms8, q8, qn, base_idx)
    print(f"gather+dist XLA int8: {t/REPS*1e3:7.2f} ms/hop  -> {gb/4/(t/REPS):6.0f} GB/s effective", flush=True)

    # ---- 3. merge_sorted at pool shapes ----
    ef = EFC
    pool_d = jnp.sort(jnp.asarray(rng.standard_normal((W, ef)).astype(np.float32)), axis=-1)
    pool_id = jnp.asarray(rng.integers(0, N, size=(W, ef)).astype(np.int32))
    pool_exp = jnp.zeros((W, ef), dtype=jnp.int32)
    nd = jnp.asarray(rng.standard_normal((W, M0)).astype(np.float32))
    nids = jnp.asarray(rng.integers(0, N, size=(W, M0)).astype(np.int32))

    @jax.jit
    def merge_loop(pool_d, pool_id, pool_exp, nd, nids):
        def body(i, carry):
            pd, pid, pexp = carry
            d2 = nd + i.astype(jnp.float32) * 0.001
            pd, (pid, pexp) = topk.merge_sorted(pd, (pid, pexp), d2, (nids, jnp.zeros_like(nids)), ef)
            return pd, pid, pexp
        return jax.lax.fori_loop(0, REPS, body, (pool_d, pool_id, pool_exp))[0]

    t, _ = timeit(merge_loop, pool_d, pool_id, pool_exp, nd, nids)
    print(f"merge_sorted:         {t/REPS*1e3:7.2f} ms/hop", flush=True)

    @jax.jit
    def merge_ranked_loop(pool_d, pool_id, pool_exp, nd, nids):
        def body(i, carry):
            pd, pid, pexp = carry
            d2 = nd + i.astype(jnp.float32) * 0.001
            pd, pid, pexp = topk.merge_ranked(pd, pid, pexp, d2, nids, ef, dedup=True)
            return pd, pid, pexp
        return jax.lax.fori_loop(0, REPS, body, (pool_d, pool_id, pool_exp))[0]

    t, _ = timeit(merge_ranked_loop, pool_d, pool_id, pool_exp, nd, nids)
    print(f"merge_ranked+dedup:   {t/REPS*1e3:7.2f} ms/hop", flush=True)

    # scatter-by-position alone (the suspect inside merge_ranked on TPU)
    all_pos = jnp.asarray(rng.integers(0, ef, size=(W, ef + M0)).astype(np.int32))
    all_val = jnp.asarray(rng.standard_normal((W, ef + M0)).astype(np.float32))

    @jax.jit
    def scatter_loop(pos, val):
        b_idx = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 0)
        def body(i, acc):
            p = (pos + i) % ef
            out = jnp.full((W, ef), jnp.inf).at[b_idx, p].set(val, mode="drop")
            return acc + out[:, 0]
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((W,), jnp.float32))

    t, _ = timeit(scatter_loop, all_pos, all_val)
    print(f"row scatter [W,{ef+M0}]->{ef}: {t/REPS*1e3:7.2f} ms/hop", flush=True)
    if os.environ.get("PROF_QUICK") == "1":
        return

    # contains + unique_mask (the dedup ops per hop)
    @jax.jit
    def dedup_loop(nids, pool_id):
        def body(i, acc):
            ii = (nids + i) % N
            c = topk.contains(ii, pool_id)
            u = topk.unique_mask(ii)
            return acc + jnp.sum(c & u, axis=-1)
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((W,), jnp.int32))

    t, _ = timeit(dedup_loop, nids, pool_id)
    print(f"contains+unique:      {t/REPS*1e3:7.2f} ms/hop", flush=True)

    # links gather per hop [W] -> [W, M0]
    links0 = jnp.asarray(g.links0)  # pre-build: all -1; shape is what matters

    @jax.jit
    def links_loop(links0, cur):
        def body(i, acc):
            c = (cur + i * 13) % N
            return acc + jnp.sum(links0[c], axis=-1)
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((W,), jnp.int32))

    cur = jnp.asarray(rng.integers(0, N, size=W).astype(np.int32))
    t, _ = timeit(links_loop, links0, cur)
    print(f"links row gather:     {t/REPS*1e3:7.2f} ms/hop", flush=True)

    # ---- 4. full beam at construction shapes over a real graph ----
    # (fixture cached on disk — the built graph is only a measurement
    # substrate; delete /tmp/prof_graph.pkl after builder changes that
    # alter graph shape)
    import pickle

    cache = f"/tmp/prof_graph_{N}_{D}_{EFC}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            g = pickle.load(f)
        print(f"[graph fixture loaded from {cache}]", flush=True)
    else:
        t0 = time.perf_counter()
        build_graph(g, np.arange(N, dtype=np.int64), np.empty(0, dtype=np.int64),
                    BuildOptions(ef_construction=EFC, wave_size=W))
        t_build = time.perf_counter() - t0
        print(f"[graph fixture build: {t_build:.1f} s -> {N/t_build:.0f} vec/s]", flush=True)
        with open(cache, "wb") as f:
            pickle.dump(g, f)

    dev = to_device(g)
    seeds = jnp.broadcast_to(dev.entry_slots[None, :], (W, dev.entry_slots.shape[0]))

    for mi in (16, 64):
        f = jax.jit(partial(beam.beam_search, ef=EFC, max_iters=mi, level=0))
        t, res = timeit(f, dev, q, qn, seeds)
        it = int(np.asarray(res.iters))
        print(f"beam_search mi={mi:3d}: {t*1e3:8.1f} ms  iters={it}  -> {t/max(it,1)*1e3:6.2f} ms/iter", flush=True)

    # ---- 5. wave_insert_level at level 0, decomposed ----
    from hannoy_tpu.build import wave_ops
    from hannoy_tpu.ops import prune as prune_mod
    wave = jnp.asarray(rng.choice(N, size=W, replace=False).astype(np.int32))
    node_ok = jnp.asarray(g.valid_mask())
    seeds_np = np.asarray(seeds)

    def run_wave(dev_g, bi):
        r = wave_ops.wave_insert_level(
            dev_g, wave, jnp.asarray(seeds_np), node_ok, jnp.int32(0),
            None, None, is_level0=True, ef=EFC, cap=M0, alpha=1.0, flat=False,
            beam_iters=bi)
        return r.graph.links0

    for bi, label in ((EFC + 16, "full beam"), (2, "beam_iters=2")):
        out = run_wave(to_device(g), bi)  # compile
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            dev_i = to_device(g)
            jax.block_until_ready(dev_i.links0)
            t0 = time.perf_counter()
            out = jax.device_get(run_wave(dev_i, bi))
            best = min(best, time.perf_counter() - t0)
        print(f"wave_insert_level({label}, W={W}, CH_A={wave_ops._CHUNK_A}, CH_B={wave_ops._CHUNK_B}): {best*1e3:8.1f} ms -> {W/best:.0f} vec/s", flush=True)

    # robust_prune standalone at wave shapes (part of the non-beam cost)
    dev = to_device(g)
    cand_ids = jnp.asarray(rng.integers(0, N, size=(W, EFC)).astype(np.int32))
    cand_d = jnp.sort(jnp.asarray(rng.random((W, EFC)).astype(np.float32)), axis=-1)

    @jax.jit
    def prune_loop(vectors, norms, cand_ids, cand_d):
        def body(i, acc):
            ids, d = prune_mod.robust_prune(
                metric, vectors, norms, (cand_ids + i) % N, cand_d, M0, 1.0)
            return acc + jnp.sum(ids[:, 0])
        return jax.lax.fori_loop(0, 3, body, jnp.int32(0))

    t, _ = timeit(prune_loop, dev.vectors, dev.norms, cand_ids, cand_d, reps=2)
    print(f"robust_prune [W,{EFC}]->{M0}: {t/3*1e3:8.1f} ms per call", flush=True)


if __name__ == "__main__":
    main()
