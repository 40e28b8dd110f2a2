"""CPU sanity check of the bulk cluster-blocked builder (build/bulk.py):
build N clustered vectors with bulk forced on and with the wave path,
compare recall@10 against exact ground truth and basic link health.
Usage: python scripts/check_bulk.py [N] [D] [--brute]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":  # importable on any backend (check_upper_flat)
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def build(data, metric, opts_kw, m=16, m0=32):
    from hannoy_tpu.build.builder import BuildOptions, build_graph
    from hannoy_tpu.models.hnsw import HostGraph, slot_capacity
    from hannoy_tpu.ops import codecs, distances

    n, d = data.shape
    g = HostGraph.empty(metric, d, m, m0, capacity=slot_capacity(n))
    packed = codecs.pack(data, metric.codec)
    norms = distances.np_norms(metric, packed)
    slots = np.arange(n, dtype=np.int64)
    for i in range(n):
        g.alloc_slot(i)
    g.vectors[:n] = packed
    g.norms[:n] = norms
    t0 = time.perf_counter()
    stats = build_graph(g, slots, np.empty(0, dtype=np.int64), BuildOptions(**opts_kw))
    dt = time.perf_counter() - t0
    return g, stats, dt


def recall_at(g, queries, k=10, ef=50):
    import jax.numpy as jnp

    from hannoy_tpu.models.flat import flat_topk
    from hannoy_tpu.models.hnsw import to_device
    from hannoy_tpu.ops import beam, codecs, distances

    dev = to_device(g)
    qp = codecs.pack(queries, g.metric.codec)
    q = jnp.asarray(qp)
    qn = jnp.asarray(distances.np_norms(g.metric, qp))
    exact_d, _ = flat_topk(g.metric.name, q, qn, dev.vectors, dev.norms, dev.valid, k)
    thresh = np.asarray(exact_d)[:, k - 1 : k] + 1e-6
    res = beam.hnsw_search(dev, q, qn, ef)
    found = np.asarray(res.dists)[:, :k]
    return float((found <= thresh).mean())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    from hannoy_tpu.ops import distances

    metric = distances.COSINE
    rng = np.random.default_rng(42)
    n_clusters = max(32, n // 256)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    data = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    nq = 256
    q_assign = rng.integers(0, n_clusters, size=nq)
    queries = (centers[q_assign] + rng.standard_normal((nq, d))).astype(np.float32)

    variants = [
        ("bulk", dict(ef_construction=48, bulk=True)),
        ("wave", dict(ef_construction=48, bulk=False, wave_size=4096)),
    ]
    spec = os.environ.get("CHECK_BULK_VARIANTS")
    if spec:
        # e.g. "bulk_alpha=1.2;bulk_alpha=1.3,bulk_k=64"
        variants = []
        for part in spec.split(";"):
            kw = dict(ef_construction=48, bulk=True)
            for item in part.split(","):
                if not item:
                    continue
                k, v = item.split("=")
                kw[k] = float(v) if "." in v else int(v)
                if k in ("bulk", "bulk_backbone", "bulk_renumber"):
                    kw[k] = bool(kw[k])  # eligible() tests identity (is False)
            variants.append((part or "bulk", kw))
    for label, kw in variants:
        g, stats, dt = build(data, metric, kw)
        g.check_validity()
        # link health
        live = np.nonzero(g.levels >= 0)[0]
        deg = (g.links0[live] >= 0).sum(axis=1)
        inbound = np.bincount(
            g.links0[live][g.links0[live] >= 0], minlength=g.capacity
        )[live]
        for ef in (50, 100):
            r = recall_at(g, queries, ef=ef)
            print(
                f"{label}: n={n} d={d} build={dt:.1f}s recall@10(ef={ef})={r:.4f} "
                f"out-deg avg={deg.mean():.1f} min={deg.min()} "
                f"in-deg 0-count={(inbound == 0).sum()} links={stats.links_added}"
            )


if __name__ == "__main__":
    main()
