"""Diagnose bulk-graph recall: which true neighbors are missed and why.
Checks (a) BFS reachability of missed items from the entry points through
the layer-0 graph, (b) whether the search beam's entry region reaches
them, (c) in/out degree stats of missed vs found items.
"""

from __future__ import annotations

import os
import sys
from collections import deque

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    import jax.numpy as jnp

    from hannoy_tpu.models.flat import flat_topk
    from hannoy_tpu.models.hnsw import to_device
    from hannoy_tpu.ops import beam, codecs, distances
    from check_bulk import build

    metric = distances.COSINE
    rng = np.random.default_rng(42)
    n_clusters = max(32, n // 256)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    data = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    nq = 256
    q_assign = rng.integers(0, n_clusters, size=nq)
    queries = (centers[q_assign] + rng.standard_normal((nq, d))).astype(np.float32)

    g, stats, dt = build(data, metric, dict(ef_construction=48, bulk=True))

    dev = to_device(g)
    qp = codecs.pack(queries, metric.codec)
    q = jnp.asarray(qp)
    qn = jnp.asarray(distances.np_norms(metric, qp))
    k = 10
    exact_d, exact_s = flat_topk(metric.name, q, qn, dev.vectors, dev.norms, dev.valid, k)
    exact_d, exact_s = np.asarray(exact_d), np.asarray(exact_s)
    res = beam.hnsw_search(dev, q, qn, 100)
    found_s = np.asarray(res.slots)[:, :100]
    found_d = np.asarray(res.dists)

    # BFS from entry points over layer-0 links
    adj = g.links0
    seen = np.zeros(g.capacity, dtype=bool)
    dq = deque(int(e) for e in g.entry_slots)
    for e in g.entry_slots:
        seen[e] = True
    while dq:
        s = dq.popleft()
        for nb in adj[s]:
            if nb >= 0 and not seen[nb]:
                seen[nb] = True
                dq.append(int(nb))
    live = g.levels >= 0
    print(f"layer-0 BFS from entry points: reachable {seen[live].sum()}/{live.sum()}")

    # which exact top-10 items were missed (beyond distance tie epsilon)?
    missed = []
    for b in range(nq):
        thresh = exact_d[b, k - 1] + 1e-6
        got = set(found_s[b][found_d[b][:100] <= thresh].tolist())
        for j in range(k):
            s = int(exact_s[b, j])
            if s not in got and exact_d[b, j] <= thresh:
                missed.append((b, s, float(exact_d[b, j])))
    missed_slots = sorted({s for _, s, _ in missed})
    print(f"missed (query,item) pairs: {len(missed)}; unique missed items: {len(missed_slots)}")
    if missed_slots:
        ms = np.asarray(missed_slots)
        print(f"  missed reachable by BFS: {seen[ms].sum()}/{len(ms)}")
        indeg = np.bincount(adj[live][adj[live] >= 0], minlength=g.capacity)
        outdeg = (adj >= 0).sum(axis=1)
        print(f"  missed in-deg: mean {indeg[ms].mean():.1f} min {indeg[ms].min()}")
        print(f"  missed out-deg: mean {outdeg[ms].mean():.1f} min {outdeg[ms].min()}")
        print(f"  all    in-deg: mean {indeg[live].mean():.1f}")
        # are missed items' nearest neighbors linked to them?
        # check how many queries missing an item had *other* top-10 hits in row
        per_q = {}
        for b, s, _ in missed:
            per_q.setdefault(b, []).append(s)
        sizes = sorted(len(v) for v in per_q.items())
        print(f"  queries affected: {len(per_q)}; missed-per-query max {max(len(v) for v in per_q.values())}")
        # distance rank of missed items within their row neighborhoods
        b, s, dd = missed[0]
        print(f"  example: query {b} missed slot {s} d={dd:.4f}; row of nearest found:")
        print(f"    exact top10 slots: {exact_s[b].tolist()}")
        print(f"    beam top10 slots:  {found_s[b][:10].tolist()}")

    # oracle-descent test: seed the layer-0 beam at each query's exact
    # nearest layer-1 member — isolates descent quality from L0 quality
    l1_members = np.nonzero(g.levels >= 1)[0]
    mask = np.zeros(g.capacity, dtype=bool)
    mask[l1_members] = True
    d1, s1 = flat_topk(metric.name, q, qn, dev.vectors, dev.norms, jnp.asarray(mask), 1)
    seeds = jnp.asarray(np.asarray(s1)[:, :1].astype(np.int32))
    res_o = beam.beam_search(dev, q, qn, seeds, 100)
    found_o = np.asarray(res_o.dists)[:, :k]
    thresh = exact_d[:, k - 1 : k] + 1e-6
    r_orc = float((found_o <= thresh).mean())
    res_n = beam.hnsw_search(dev, q, qn, 100)
    found_n = np.asarray(res_n.dists)[:, :k]
    r_nrm = float((found_n <= thresh).mean())
    print(f"recall@10 ef=100: normal descent {r_nrm:.4f} vs oracle L1 seed {r_orc:.4f}")


if __name__ == "__main__":
    main()
