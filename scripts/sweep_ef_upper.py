"""Round-4 decisive sweep: build ONE 1M index with the shipped defaults
(maxmin k-means init + navigability backbone) and grid-measure
(ef, ef_upper) recall@10 + QPS on the real chip.

The round-4 bisect pinned the residual 1M recall gap (0.926 @ef200 vs
the 0.93 bar) on descent seed quality: oracle-seeded recall is 1.0 on
the same graph. ``ef_upper`` (pooled layer-1 descent,
ops/beam._descend_start) is the lever; this sweep fixes its default.

Usage: python scripts/sweep_ef_upper.py [N] [D]
Env: SWEEP_EFS="50,100,200" SWEEP_UPPERS="1,8,16,32" BISECT_EFC=96
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    efs = [int(x) for x in os.environ.get("SWEEP_EFS", "50,100,200").split(",")]
    uppers = [int(x) for x in os.environ.get("SWEEP_UPPERS", "1,8,16,32").split(",")]
    efc = int(os.environ.get("BISECT_EFC", 48 if n <= 200_000 else 96))

    import jax
    import jax.numpy as jnp

    from bisect_recall import gen_data
    from check_bulk import build
    from hannoy_tpu.models.flat import flat_topk
    from hannoy_tpu.models.hnsw import to_device
    from hannoy_tpu.ops import beam, distances

    data, queries = gen_data(n, d)
    metric = distances.COSINE
    g, stats, dt = build(data, metric, dict(ef_construction=efc))
    print(json.dumps({"n": n, "d": d, "efc": efc, "build_s": round(dt, 1)}), flush=True)

    dev = to_device(g)
    qj = jnp.asarray(queries)
    qnj = jnp.asarray(distances.np_norms(metric, queries))
    K = 10
    ed, _ = flat_topk(metric.name, qj, qnj, dev.vectors, dev.norms, dev.valid, K)
    thresh = np.asarray(jax.device_get(ed))[:, K - 1 : K] + 1e-6
    nq = queries.shape[0]

    for ef in efs:
        for eu in uppers:
            res = beam.hnsw_search(dev, qj, qnj, ef, ef_upper=eu)
            jax.device_get(res.dists)  # warm compile + fence
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                res = beam.hnsw_search(dev, qj, qnj, ef, ef_upper=eu)
            found = np.asarray(jax.device_get(res.dists))[:, :K]
            dt = (time.perf_counter() - t0) / reps
            recall = float((found <= thresh).mean())
            print(
                json.dumps(
                    {
                        "ef": ef,
                        "ef_upper": eu,
                        "recall10": round(recall, 4),
                        "qps": round(nq / dt, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
