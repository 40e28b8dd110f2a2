"""Deep-dive the bulk layer-0 graph quality at scale (round-4 bisect #2).

The 1M bisect showed oracle-seeded L0 recall of 0.78 (vs ~0.999 at 30k):
the bulk-built layer-0 graph itself degrades at 1M. This script builds
layer 0 with the default bulk path at N and measures, for a sample of
members:

  1. candidate recall — fraction of each sampled member's true top-10
     that appeared in its bulk candidate list (isolates k-means +
     adjacency-block quality from prune/connect),
  2. edge recall — fraction of true top-10 present in the final links0
     row (after α-prune + reverse merge),
  3. 2-hop recall — fraction reachable within two hops (what an ef-wide
     beam can recover locally),
  4. undirected connected components of the layer-0 graph,
  5. k-means balance stats (cluster size distribution).

Usage: python scripts/diag_bulk_1m.py N [D]
Env: DIAG_VARIANT="bulk_cluster_size=1024,bulk_adj=16" (BuildOptions
overrides), DIAG_CPU=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("DIAG_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def run_variant(n, d, data, queries, label, kw):
    import jax
    import jax.numpy as jnp

    from check_bulk import build
    from hannoy_tpu.models.flat import flat_topk
    from hannoy_tpu.models.hnsw import to_device
    from hannoy_tpu.ops import beam, distances

    metric = distances.COSINE
    g, stats, dt = build(data, metric, kw)
    out = {"n": n, "d": d, "variant": label, "build_s": round(dt, 1)}
    dev = to_device(g)

    # search + oracle-seeded recall on real queries (the bisect signals)
    qj = jnp.asarray(queries)
    qnj = jnp.asarray(distances.np_norms(metric, queries))
    ed, es = flat_topk(metric.name, qj, qnj, dev.vectors, dev.norms, dev.valid, 10)
    ed, es = np.asarray(jax.device_get(ed)), np.asarray(jax.device_get(es))
    qthresh = ed[:, 9:10] + 1e-6
    for ef in (50, 200):
        res = beam.hnsw_search(dev, qj, qnj, ef)
        found = np.asarray(jax.device_get(res.dists))[:, :10]
        out[f"recall_ef{ef}"] = round(float((found <= qthresh).mean()), 4)
    res = beam.beam_search(dev, qj, qnj, jnp.asarray(es[:, :1].astype(np.int32)), 200)
    found = np.asarray(jax.device_get(res.dists))[:, :10]
    out["oracle_ef200"] = round(float((found <= qthresh).mean()), 4)

    # ---- sampled exact top-10 ----
    rng = np.random.default_rng(7)
    S, K = 2048, 10
    sample = rng.choice(n, size=S, replace=False).astype(np.int64)
    q = dev.vectors[jnp.asarray(sample)]
    qn = dev.norms[jnp.asarray(sample)]
    exact_d, exact_s = flat_topk(metric.name, q, qn, dev.vectors, dev.norms, dev.valid, K + 1)
    exact_s = np.asarray(jax.device_get(exact_s))
    # drop self
    true_nn = np.empty((S, K), dtype=np.int64)
    for i in range(S):
        row = [s for s in exact_s[i] if s != sample[i]][:K]
        true_nn[i] = row

    links0 = g.links0  # [cap, W]

    # ---- candidate recall (re-run layer_candidates on the built dev) ----
    from hannoy_tpu.build import bulk
    from hannoy_tpu.build.builder import BuildOptions

    opts = BuildOptions(**kw)
    members = np.nonzero(g.levels >= 0)[0].astype(np.int64)
    Kc = opts.bulk_k or max(opts.ef_construction, g.m0 + 16)
    crng = np.random.default_rng(opts.seed + 0x6B)
    t0 = time.perf_counter()
    cand_ids, cand_d, order, cross = bulk.layer_candidates(dev, members, Kc, opts, crng)
    cand_ids = np.asarray(jax.device_get(cand_ids))
    out["cand_s"] = round(time.perf_counter() - t0, 1)
    pos_of = np.full(g.capacity, -1, dtype=np.int64)
    pos_of[members] = np.arange(len(members))
    cov = []
    for i in range(S):
        cl = set(cand_ids[pos_of[sample[i]]].tolist())
        cov.append(len(cl.intersection(true_nn[i].tolist())) / K)
    out["cand_recall10"] = round(float(np.mean(cov)), 4)

    # ---- edge recall + 2-hop recall ----
    edge, hop2 = [], []
    for i in range(S):
        row = links0[sample[i]]
        row = set(row[row >= 0].tolist())
        edge.append(len(row.intersection(true_nn[i].tolist())) / K)
        two = set(row)
        for t in row:
            r2 = links0[t]
            two.update(r2[r2 >= 0].tolist())
        hop2.append(len(two.intersection(true_nn[i].tolist())) / K)
    out["edge_recall10"] = round(float(np.mean(edge)), 4)
    out["hop2_recall10"] = round(float(np.mean(hop2)), 4)

    # ---- connected components (undirected, live rows) ----
    live = np.nonzero(g.levels >= 0)[0]
    live_mask = np.zeros(g.capacity, dtype=bool)
    live_mask[live] = True
    src = np.repeat(np.arange(g.capacity), links0.shape[1])
    dst = links0.reshape(-1).astype(np.int64)
    ok = (dst >= 0) & live_mask[src] & live_mask[np.maximum(dst, 0)]
    src, dst = src[ok], dst[ok]
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    adj = coo_matrix(
        (np.ones(len(src), dtype=np.int8), (src, dst)),
        shape=(g.capacity, g.capacity),
    )
    n_comp, labels = connected_components(adj, directed=False)
    sizes = sorted(np.bincount(labels[live]).tolist(), reverse=True)
    sizes = [s for s in sizes if s > 0]
    out["n_components"] = len(sizes)
    out["largest_component_frac"] = round(sizes[0] / len(live), 4)
    out["component_sizes_top5"] = sizes[:5]

    # ---- k-means balance (re-run the partition like layer_candidates) ----
    C = max(8, len(members) // opts.bulk_cluster_size)
    assign = bulk.kmeans_partition(
        dev, members, C, opts.bulk_kmeans_iters,
        np.random.default_rng(opts.seed + 0x6B),
        init=opts.bulk_init, init_sample=opts.bulk_init_sample,
    )
    sizes = np.bincount(assign, minlength=C)
    out["kmeans"] = {
        "C": C,
        "empty": int((sizes == 0).sum()),
        "p50": int(np.median(sizes)),
        "p95": int(np.quantile(sizes, 0.95)),
        "max": int(sizes.max()),
    }
    print(json.dumps(out), flush=True)
    del dev
    g.dev_cache = None


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768

    from bisect_recall import gen_data

    efc = int(os.environ.get("BISECT_EFC", 48 if n <= 200_000 else 96))
    data, queries = gen_data(n, d)

    spec = os.environ.get("DIAG_VARIANTS", os.environ.get("DIAG_VARIANT", ""))
    variants = []
    for part in spec.split(";"):
        kw = dict(ef_construction=efc)
        for item in part.split(","):
            if not item:
                continue
            key, v = item.split("=")
            try:
                kw[key] = float(v) if "." in v else int(v)
            except ValueError:
                kw[key] = v
        variants.append((part or "default", kw))

    for label, kw in variants:
        run_variant(n, d, data, queries, label, kw)


if __name__ == "__main__":
    main()
