"""A/B the routing-layer flat-candidate path on one chip, one process.

Builds N clustered vectors twice per variant (first build pays compile;
the second is the steady number), with the exact compact-table candidate
matmul for levels >= 1 (BuildOptions.upper_flat_max, the round-3 change)
ON vs OFF, and prints steady build time + recall so both variants share
the same chip weather.

Usage: python scripts/check_upper_flat.py [N] [D] [METRIC]
Env: UF_EFC (48), UF_BULK (unset -> auto), UF_WAVE (4096)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    from hannoy_tpu.build.builder import BuildOptions, build_graph
    from hannoy_tpu.models.hnsw import HostGraph, slot_capacity
    from hannoy_tpu.ops import codecs, distances
    from scripts.check_bulk import recall_at

    metric = distances.by_name(
        (sys.argv[3] if len(sys.argv) > 3 else "cosine").replace("_", " ")
    )
    efc = int(os.environ.get("UF_EFC", 48))
    wave = int(os.environ.get("UF_WAVE", 4096))
    bulk_env = os.environ.get("UF_BULK")
    bulk = None if bulk_env is None else bool(int(bulk_env))

    rng = np.random.default_rng(42)
    n_clusters = max(32, n // 256)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    data = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    nq = 256
    q_assign = rng.integers(0, n_clusters, size=nq)
    queries = (centers[q_assign] + rng.standard_normal((nq, d))).astype(np.float32)

    packed = codecs.pack(data, metric.codec)
    norms = distances.np_norms(metric, packed)
    slots = np.arange(n, dtype=np.int64)

    def stage():
        g = HostGraph.empty(metric, d, 16, 32, capacity=slot_capacity(n))
        for i in range(n):
            g.alloc_slot(i)
        g.vectors[:n] = packed
        g.norms[:n] = norms
        return g

    pool = int(os.environ.get("UF_POOL", 384))
    variants = os.environ.get("UF_VARIANTS", "flat,beam").split(",")
    pairs = [("flat-upper", 65536), ("beam-upper", 0)]
    for label, ufm in [p for p in pairs if p[0].split("-")[0] in variants]:
        kw = dict(
            ef_construction=efc, wave_size=wave, upper_flat_max=ufm,
            upper_flat_pool=pool,
        )
        if bulk is not None:
            kw["bulk"] = bulk
        times = []
        g = stage()
        for rep in range(2):
            if rep:
                g.reset_links()  # steady rebuild: device vector cache warm
            t0 = time.perf_counter()
            stats = build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(**kw))
            times.append(time.perf_counter() - t0)
        g.check_validity()
        r50 = recall_at(g, queries, ef=50)
        r100 = recall_at(g, queries, ef=100)
        print(
            f"{label}: n={n} d={d} {metric.name} cold={times[0]:.1f}s "
            f"steady={times[1]:.1f}s ({n/times[1]:.0f} vec/s) "
            f"recall@10 ef50={r50:.4f} ef100={r100:.4f} "
            f"waves={stats.waves} beam_iters={stats.beam_iters}",
            flush=True,
        )


if __name__ == "__main__":
    main()
