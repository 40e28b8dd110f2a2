"""Deep-10M-class scale demonstration through the store-backed sharded
path on one chip.

Two graded configurations (VERDICT r4 missing #2):
  * 10M x 96d euclidean (Deep1B's 96d slice — the classic 10M ANN config)
  * 10M x 768d cosine — the reference's OWN published 10M row
    (docs/benchmarks/arroy_hannoy.md:21: build 7216.37 s, 41.39 GiB DB,
    r@10 0.87, 53.28 ms/query on an 8-core i7-6900K). 10M x 768 f32 is
    30.7 GB of vectors — beyond one v5e chip's 16 GB HBM — so this is the
    ">1 chip HBM" north-star config: the store shards the vectors, builds
    run per shard, and serving uses a reduced-precision HBM tier
    (DEEP_TIER=int8: 7.7 GB resident) or per-shard HBM swap.

Flow (everything durable, nothing bypasses the store):
  1. ShardedWriter(n_shards=S) routes N items round-robin into S store
     indexes under one wtxn (add_items batched puts + journal stones).
  2. build(spmd=False): each shard builds sequentially on the one real
     chip through the full single-chip Writer path at full f32 — the
     cluster-blocked bulk builder (build/bulk.py) for layer 0, insertion
     waves for the hierarchy — then flushes its dirty rows. (Lockstep
     SPMD builds over a real mesh are exercised by dryrun_multichip /
     test_spmd_build on the 8-device CPU mesh; one axon chip serves
     shards sequentially.)
  3. Per-shard Reader.open + graph invariant checks; DEEP_TIER applies
     to the serving upload only (the store copy stays f32).
  4. Recall-vs-QPS: per-shard batched searches fanned out on the chip,
     top-k merged across shards by (distance, id); id-recall@10 against
     EXACT f32 ground truth computed host-side (blocked BLAS over the
     raw corpus — immune to tier quantization bias in thresholds).
  5. HBM capacity math per shard printed; rows appended to
     benchmarks/results_r5.jsonl.

Env: DEEP_N (default 10_000_000), DEEP_D (96), DEEP_SHARDS (4),
DEEP_METRIC (euclidean|cosine), DEEP_TIER (''|bf16|int8 — serving tier),
DEEP_EFC (48), DEEP_Q (256), DEEP_EF (sweep), DEEP_PATH (store dir),
DEEP_RESUME=1 (skip staging+build if every shard already opens clean).
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
from hannoy_tpu.models.hnsw import to_device
from hannoy_tpu.ops import beam, codecs, distances
from bench import chip_calibration

N = int(os.environ.get("DEEP_N", 10_000_000))
D = int(os.environ.get("DEEP_D", 96))
S = int(os.environ.get("DEEP_SHARDS", 4))
EFC = int(os.environ.get("DEEP_EFC", 48))
NQ = int(os.environ.get("DEEP_Q", 256))
EF_SWEEP = [int(x) for x in os.environ.get("DEEP_EF", "50,100,200").split(",")]
METRIC_NAME = os.environ.get("DEEP_METRIC", "euclidean")
TIER = os.environ.get("DEEP_TIER", "")  # '', 'bf16', 'int8' — serving only
RESUME = os.environ.get("DEEP_RESUME", "0") == "1"
K = 10
M, M0 = 16, 32

PY_METRIC = {"euclidean": Metric.EUCLIDEAN, "cosine": Metric.COSINE}[METRIC_NAME]


def make_data(n: int, d: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Clustered synthetic corpus (mixture of gaussians — bench.py's
    generator at 10M scale; pure isotropic high-d gaussian is the known
    adversarial case for every graph-ANN method, and real Deep1B/datacomp
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


def host_exact_gt(data: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    """Exact top-k item ids per query, f32 on host (blocked BLAS).

    Serving may quantize vectors (DEEP_TIER), which would bias a
    device-side threshold-recall both ways; id-recall against the raw f32
    corpus is the honest end-to-end number (graph + codec loss)."""
    t0 = time.perf_counter()
    nq = queries.shape[0]
    if METRIC_NAME == "cosine":
        qn = np.linalg.norm(queries, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        qu = queries / qn
    best_d = np.full((nq, k), np.inf, dtype=np.float32)
    best_i = np.full((nq, k), -1, dtype=np.int64)
    step = 500_000
    for i in range(0, data.shape[0], step):
        blk = data[i : i + step]
        if METRIC_NAME == "cosine":
            bn = np.linalg.norm(blk, axis=1)
            bn[bn == 0] = 1.0
            cos = (qu @ blk.T) / bn[None, :]
            d = (1.0 - cos) * 0.5  # distance/cosine.rs:28-61
        else:
            # squared L2 (spaces/simple.rs:49-51 — reference skips sqrt)
            d = (
                (queries**2).sum(1, keepdims=True)
                - 2.0 * (queries @ blk.T)
                + (blk**2).sum(1)[None, :]
            )
        cand_d = np.concatenate([best_d, d.astype(np.float32)], axis=1)
        cand_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(i, i + blk.shape[0]), (nq, blk.shape[0]))],
            axis=1,
        )
        sel = np.argpartition(cand_d, k - 1, axis=1)[:, :k]
        best_d = np.take_along_axis(cand_d, sel, axis=1)
        best_i = np.take_along_axis(cand_i, sel, axis=1)
    order = np.argsort(best_d, axis=1, kind="stable")
    best_i = np.take_along_axis(best_i, order, axis=1)
    print(f"host exact GT in {time.perf_counter() - t0:.1f}s", flush=True)
    return best_i


def main() -> None:
    path = os.environ.get("DEEP_PATH") or os.path.join("/tmp", f"deep{N}")
    print(
        f"deep10m: N={N} D={D} metric={METRIC_NAME} shards={S} efc={EFC} "
        f"tier={TIER or 'f32'} store={path}",
        flush=True,
    )
    print("calib_pre:", chip_calibration(), flush=True)
    data, queries = make_data(N, D)
    gt_ids = host_exact_gt(data, queries, K)

    db = Database(path, PY_METRIC, map_size=64 << 30)
    from hannoy_tpu.parallel import ShardedWriter

    stage_s = build_s = 0.0
    resumed = False
    if RESUME:
        try:
            for s in range(S):
                Reader.open(db, s)
            resumed = True
            print("resume: all shards open clean, skipping staging+build", flush=True)
        except Exception as e:  # noqa: BLE001 — any open failure → fresh build
            print(f"resume declined: {e!r}", flush=True)

    if not resumed:
        t0 = time.perf_counter()
        w = ShardedWriter(db, D, n_shards=S, m=M, ef=EFC, m0=M0)
        step = 1_000_000
        for i in range(0, N, step):
            w.add_items(range(i, min(i + step, N)), data[i : i + step])
        stage_s = time.perf_counter() - t0
        print(f"staged {N} items into {S} store shards in {stage_s:.1f}s", flush=True)
        # Commit the staging wtxn BEFORE building: at 768d the overlay
        # holds the full 30 GB corpus, and the builds add ~6 GB of host
        # graph per shard — holding all three (corpus array, overlay,
        # graphs) OOM-killed the first run at 130 GB RSS. Item puts +
        # journal stones are durable after this; the builds run in a
        # fresh wtxn (journal-driven, writer.rs:521-603 semantics).
        db.commit_rw_txn()
        del data  # GT is computed; staging is durable; free 30 GB

        t0 = time.perf_counter()
        w.build(spmd=False)
        build_s = time.perf_counter() - t0
        db.commit_rw_txn()
        print(f"built {S} shards in {build_s:.1f}s ({N / build_s:.0f} vec/s)", flush=True)
    else:
        del data  # free 30 GB before serving holds S device graphs

    # ---- serving tier applies to HBM uploads only (store copy stays f32)
    if TIER == "bf16":
        os.environ["HANNOY_TPU_BF16"] = "1"
    elif TIER == "int8":
        os.environ["HANNOY_TPU_INT8"] = "1"

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
    devs, id_maps = [], []
    for r in readers:
        dev = r._dev
        devs.append(dev)
        id_maps.append(r._graph.ids)  # slot -> item id (u32)
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
        f"capacity: {per_shard/1e9:.2f} GB/shard HBM ({TIER or 'f32'} tier); "
        f"{S} shards = {S*per_shard/1e9:.2f} GB total (v5e 16 GiB/chip -> "
        f"{max(int(16e9 // per_shard), 1)} such shards/chip; f32 would be "
        f"{N*D*4/1e9:.1f} GB of vectors alone)"
    )

    metric = readers[0]._graph.metric
    qp = codecs.pack(queries, metric.codec)
    q = jnp.asarray(qp)
    qn = jnp.asarray(distances.np_norms(metric, qp))

    # ---- recall-vs-QPS sweep: per-shard beams, host (dist, id) merge ----
    results = {}
    rows = []
    for ef in EF_SWEEP:
        efu = beam.default_ef_upper(N // S, ef)  # the Reader's shipped default
        for dev in devs:  # warm compiles
            beam.hnsw_search(dev, q, qn, ef, ef_upper=efu)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            md = np.full((NQ, K), np.inf, dtype=np.float32)
            mi = np.full((NQ, K), -1, dtype=np.int64)
            for s, dev in enumerate(devs):
                res = beam.hnsw_search(dev, q, qn, ef, ef_upper=efu)
                sl = np.asarray(res.slots)[:, :K]
                sd = np.asarray(res.dists)[:, :K]
                gids = id_maps[s][np.maximum(sl, 0)].astype(np.int64)
                gids[sl < 0] = -1
                cd = np.concatenate([md, sd], axis=1)
                ci = np.concatenate([mi, gids], axis=1)
                o = np.argsort(cd, axis=1, kind="stable")[:, :K]
                md = np.take_along_axis(cd, o, axis=1)
                mi = np.take_along_axis(ci, o, axis=1)
        dt = (time.perf_counter() - t0) / reps
        # id-recall@10 vs exact f32 ground truth
        hits = sum(
            len(set(mi[b].tolist()) & set(gt_ids[b].tolist())) for b in range(NQ)
        )
        recall = hits / (NQ * K)
        qps = NQ / dt
        results[ef] = (recall, qps)
        print(f"ef={ef}: id-recall@10={recall:.4f} qps={qps:.0f}", flush=True)
        rows.append(
            {
                "bench": f"deep{N}_{D}d_{METRIC_NAME}_sharded{S}" + (f"_{TIER}" if TIER else ""),
                "ef": ef,
                "recall_at_10": round(recall, 4),
                "qps": round(qps, 1),
                "build_seconds": round(build_s, 2),
                "build_vectors_per_s": round(N / build_s, 1) if build_s else None,
                "stage_seconds": round(stage_s, 2),
                "hbm_bytes_per_shard": per_shard,
                "serve_tier": TIER or "f32",
                "bulk_bf16": distances.BULK_BF16,
                "resumed": resumed,
                "calib": chip_calibration(),
            }
        )

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "benchmarks", "results_r5.jsonl")
    with open(out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"calib_post: {chip_calibration()}", flush=True)
    print(f"rows appended to {out}", flush=True)
    db.close()


if __name__ == "__main__":
    main()
