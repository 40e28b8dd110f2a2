"""Micro-bench the routing-layer flat-candidate dispatch on the chip.

Times one [W, U] candidate dispatch — gather members, distance matrix,
select top-ef — across matmul precisions and top-k strategies, to pick
the implementation for wave_ops flat_members (the round-3 upper-flat
path, measured 10x slower than expected at HIGHEST+top_k).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_flat_micro.py [W] [U] [D]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

W = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
U = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
D = int(sys.argv[3]) if len(sys.argv) > 3 else 768
EF = 48
REPS = 8

rng = np.random.default_rng(0)
qh = rng.standard_normal((W, D)).astype(np.float32)
vh = rng.standard_normal((1 << 20, D)).astype(np.float32)
mh = rng.permutation(1 << 20)[:U].astype(np.int32)

q = jax.device_put(qh)
vecs = jax.device_put(vh)
members = jax.device_put(mh)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    got = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:42s} {dt*1e3:9.1f} ms", flush=True)
    return got


def dmat(prec, qq, mvec):
    dots = jnp.einsum(
        "bd,nd->bn", qq, mvec, preferred_element_type=jnp.float32, precision=prec
    )
    return -dots  # dot-metric surrogate; shape/FLOPs match cosine


@functools.partial(jax.jit, static_argnames=("prec", "sel", "cast"))
def run(q, vecs, members, prec="highest", sel="topk", cast=False):
    mvec = vecs[members]
    qq, mv = (q.astype(jnp.bfloat16), mvec.astype(jnp.bfloat16)) if cast else (q, mvec)
    d = dmat(prec, qq, mv)
    if sel == "topk":
        neg, idx = jax.lax.top_k(-d, EF)
        return members[idx], -neg
    elif sel == "approx":
        neg, idx = jax.lax.approx_max_k(-d, EF, recall_target=0.95)
        return members[idx], -neg
    else:  # sort-based threshold two-stage
        B = 512
        db = d.reshape(W, U // B, B)
        nb, ib = jax.lax.top_k(-db, min(EF, B) // 4)
        cand = (-nb).reshape(W, -1)
        ci = (ib + (jnp.arange(U // B) * B)[None, :, None]).reshape(W, -1)
        neg, idx = jax.lax.top_k(-cand, EF)
        return members[ci[jnp.arange(W)[:, None], idx]], -neg


print(f"W={W} U={U} D={D} ef={EF} reps={REPS}", flush=True)
timeit("gather+matmul HIGHEST + top_k", run, q, vecs, members)
timeit("gather+matmul DEFAULT + top_k", lambda a, b, c: run(a, b, c, prec="default"), q, vecs, members)
timeit("gather+matmul bf16 + top_k", lambda a, b, c: run(a, b, c, prec="default", cast=True), q, vecs, members)
timeit("gather+matmul bf16 + approx_max_k", lambda a, b, c: run(a, b, c, prec="default", cast=True, sel="approx"), q, vecs, members)
timeit("gather+matmul DEFAULT + approx_max_k", lambda a, b, c: run(a, b, c, prec="default", sel="approx"), q, vecs, members)
timeit("gather+matmul bf16 + blocked top_k", lambda a, b, c: run(a, b, c, prec="default", cast=True, sel="block"), q, vecs, members)

# matmul-only and topk-only legs
@jax.jit
def mm_only(q, vecs, members):
    mvec = vecs[members].astype(jnp.bfloat16)
    return dmat("default", q.astype(jnp.bfloat16), mvec).sum()

@jax.jit
def mm_hi(q, vecs, members):
    return dmat("highest", q, vecs[members]).sum()

d_fixed = jax.device_put(rng.standard_normal((W, U)).astype(np.float32))

@jax.jit
def tk_only(d):
    return jax.lax.top_k(-d, EF)[0].sum()

@jax.jit
def ak_only(d):
    return jax.lax.approx_max_k(-d, EF, recall_target=0.95)[0].sum()

timeit("leg: gather+matmul bf16 only", mm_only, q, vecs, members)
timeit("leg: gather+matmul HIGHEST only", mm_hi, q, vecs, members)
timeit("leg: top_k only", tk_only, d_fixed)
timeit("leg: approx_max_k only", ak_only, d_fixed)
