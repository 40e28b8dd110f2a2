"""Quick CPU sanity check of the chain-seeded wave path: build 20k
with waves wide enough to trigger the split, compare recall + link health
against the non-proto build. Usage: python scripts/check_chain.py [N]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from hannoy_tpu.build.builder import BuildOptions, build_graph  # noqa: E402
from hannoy_tpu.models.flat import flat_topk  # noqa: E402
from hannoy_tpu.models.hnsw import HostGraph, slot_capacity, to_device  # noqa: E402
from hannoy_tpu.ops import beam, codecs, distances  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
D = 64
K = 10
EFC = 48

rng = np.random.default_rng(0)
n_clusters = max(32, N // 256)
centers = rng.standard_normal((n_clusters, D)).astype(np.float32) * 4.0
assign = rng.integers(0, n_clusters, size=N)
data = (centers[assign] + rng.standard_normal((N, D))).astype(np.float32)
queries = (centers[rng.integers(0, n_clusters, size=256)] + rng.standard_normal((256, D))).astype(np.float32)

metric = distances.COSINE


def build(chain):
    g = HostGraph.empty(metric, D, 16, 32, capacity=slot_capacity(N))
    for i in range(N):
        g.alloc_slot(i)
    g.vectors[:N] = data
    g.norms[:N] = distances.np_norms(metric, data)
    t0 = time.perf_counter()
    stats = build_graph(
        g, np.arange(N, dtype=np.int64), np.empty(0, dtype=np.int64),
        BuildOptions(ef_construction=EFC, wave_size=4096, chain_seeding=bool(chain)),
    )
    dt = time.perf_counter() - t0
    return g, dt, stats


def recall(g):
    dev = to_device(g)
    qp = codecs.pack(queries, metric.codec)
    q = jnp.asarray(qp)
    qn = jnp.asarray(distances.np_norms(metric, qp))
    exact_d, _ = flat_topk(metric.name, q, qn, dev.vectors, dev.norms, dev.valid, K)
    thresh = np.asarray(exact_d)[:, K - 1 : K] + 1e-6
    res = beam.hnsw_search(dev, q, qn, 50)
    found = np.asarray(res.dists)[:, :K]
    return float((found <= thresh).mean())


for chain in (0, 1):
    g, dt, stats = build(chain)
    r = recall(g)
    print(f"chain={chain}: build {dt:.1f}s ({N/dt:.0f} vec/s cpu) recall@10={r:.4f} "
          f"beam_iters={stats.beam_iters} waves={stats.waves}", flush=True)
