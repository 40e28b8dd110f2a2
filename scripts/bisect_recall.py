"""Bisect the 1M default-path recall collapse (VERDICT r3 item 1).

One default build at N, then three measurements that pin the defect to
either the bulk layer-0 graph or the routing layers / descent:

  1. normal search recall sweep (the failing headline number),
  2. oracle-seeded layer-0 beam recall — seeds every query at its exact
     nearest neighbor (flat scan); if this is high the layer-0 graph is
     locally sound and the fault is upstream (descent / routing layers),
  3. descent-seed quality — where the greedy ef=1 descent through the
     routing layers actually lands, measured as the fraction of queries
     whose layer-0 seed is inside the exact top-100 and the seed/true
     distance ratio.

Optional variant rebuilds (same process, shared compile cache) via
BISECT_VARIANTS="upper_flat_max=0;bulk=0;..." run the same measurements
per variant.

Usage: [PYTHONPATH=...:/root/.axon_site] python scripts/bisect_recall.py N [D]
Env:   BISECT_EFC (bench rule: 48 if N<=200k else 96), BISECT_VARIANTS,
       BISECT_EFS (default "50,100,200"), BISECT_CPU=1 (force CPU).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("BISECT_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def gen_data(n: int, d: int, nq: int = 256):
    """Bench-identical generator (bench.py:115-124)."""
    rng = np.random.default_rng(42)
    n_clusters = max(32, n // 256)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    data = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    q_assign = rng.integers(0, n_clusters, size=nq)
    queries = (centers[q_assign] + rng.standard_normal((nq, d))).astype(np.float32)
    return data, queries


def measure(g, queries, efs, k=10):
    import jax
    import jax.numpy as jnp

    from hannoy_tpu.models.flat import flat_topk
    from hannoy_tpu.models.hnsw import to_device
    from hannoy_tpu.ops import beam, codecs, distances

    dev = to_device(g)
    qp = codecs.pack(queries, g.metric.codec)
    q = jnp.asarray(qp)
    qn = jnp.asarray(distances.np_norms(g.metric, qp))

    exact_d, exact_s = flat_topk(
        g.metric.name, q, qn, dev.vectors, dev.norms, dev.valid, 100
    )
    exact_d = np.asarray(jax.device_get(exact_d))
    exact_s = np.asarray(jax.device_get(exact_s))
    thresh = exact_d[:, k - 1 : k] + 1e-6

    out = {}

    # 1. normal search
    for ef in efs:
        res = beam.hnsw_search(dev, q, qn, ef)
        found = np.asarray(jax.device_get(res.dists))[:, :k]
        out[f"recall_ef{ef}"] = round(float((found <= thresh).mean()), 4)

    # 2. oracle-seeded layer-0 beam (seed = exact top-1 slot)
    seeds = jnp.asarray(exact_s[:, :1].astype(np.int32))
    for ef in efs:
        res = beam.beam_search(dev, q, qn, seeds, ef)
        found = np.asarray(jax.device_get(res.dists))[:, :k]
        out[f"oracle_ef{ef}"] = round(float((found <= thresh).mean()), 4)

    # 3. descent-seed quality
    if dev.max_level >= 1:
        ep = beam.greedy_descend(dev, q, qn, dev.max_level, 1)
        ep = np.asarray(jax.device_get(ep))
        in_top100 = np.any(exact_s[:, :100] == ep[:, None], axis=1)
        out["seed_in_top100"] = round(float(in_top100.mean()), 4)
        # distance of the seed vs the true NN
        vec = jnp.asarray(dev.vectors)[jnp.maximum(jnp.asarray(ep), 0)]
        vn = jnp.asarray(dev.norms)[jnp.maximum(jnp.asarray(ep), 0)]
        sd = distances.gathered_distances(
            g.metric, q, qn, vec[:, None, :], vn[:, None]
        )[:, 0]
        sd = np.asarray(jax.device_get(sd))
        ratio = sd / np.maximum(exact_d[:, 0], 1e-9)
        out["seed_dist_ratio_p50"] = round(float(np.median(ratio)), 3)
        out["seed_dist_ratio_p90"] = round(float(np.quantile(ratio, 0.9)), 3)

    # layer-0 graph health
    live = np.nonzero(g.levels >= 0)[0]
    deg = (g.links0[live] >= 0).sum(axis=1)
    inbound = np.bincount(
        g.links0[live][g.links0[live] >= 0], minlength=g.capacity
    )[live]
    out["outdeg_avg"] = round(float(deg.mean()), 1)
    out["indeg0"] = int((inbound == 0).sum())
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    efs = [int(x) for x in os.environ.get("BISECT_EFS", "50,100,200").split(",")]
    efc = int(os.environ.get("BISECT_EFC", 48 if n <= 200_000 else 96))

    from check_bulk import build
    from hannoy_tpu.ops import distances

    data, queries = gen_data(n, d)
    metric = distances.COSINE

    variants = [("default", dict(ef_construction=efc))]
    spec = os.environ.get("BISECT_VARIANTS")
    if spec:
        for part in spec.split(";"):
            if not part:
                continue
            kw = dict(ef_construction=efc)
            for item in part.split(","):
                key, v = item.split("=")
                if key == "bulk":
                    kw[key] = bool(int(v))
                else:
                    try:
                        kw[key] = float(v) if "." in v else int(v)
                    except ValueError:
                        kw[key] = v
            variants.append((part, kw))

    for label, kw in variants:
        t0 = time.perf_counter()
        g, stats, dt = build(data, metric, kw)
        out = {"variant": label, "n": n, "d": d, "efc": efc, "build_s": round(dt, 1)}
        out.update(measure(g, queries, efs))
        out["total_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
