"""Incremental insert/delete at flagship scale (VERDICT r4 missing #5).

The reference's core differentiator is journal-driven incremental builds:
``Writer::build`` consumes only the dirty journal and extends the existing
graph (writer.rs:521-603), with FreshDiskANN-style deleted-gap repair
(hnsw.rs:334-415). This script times that story at 1M scale on the real
chip, store-backed end to end:

  1. Stage N0 items through ``Writer.add_items`` (journal stones), bulk
     build, commit — the fresh-build cost.
  2. Timed incremental round: +ADD new items and -DEL random existing
     items in ONE transaction, ``build()`` again — the journal makes this
     a delta build (waves over ~ADD items + repair over DEL holes), not a
     re-index.
  3. Recall retention: id-recall@10 of the final index vs exact f32 host
     ground truth over the surviving corpus; assert no deleted item is
     returned. Compare against a from-scratch build of the same final
     corpus (recall parity ⇒ the incremental graph is as good as fresh).

Env: INC_N0 (default 1_000_000), INC_ADD (100_000), INC_DEL (10_000),
INC_D (768), INC_EFC (96), INC_EF (50,100), INC_Q (256),
INC_PATH (store dir), INC_FRESH_BASELINE=0 to skip step 3's rebuild.
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
from hannoy_tpu.ops import beam, codecs, distances
from bench import chip_calibration

N0 = int(os.environ.get("INC_N0", 1_000_000))
ADD = int(os.environ.get("INC_ADD", 100_000))
DEL = int(os.environ.get("INC_DEL", 10_000))
D = int(os.environ.get("INC_D", 768))
EFC = int(os.environ.get("INC_EFC", 96))
NQ = int(os.environ.get("INC_Q", 256))
EF_SWEEP = [int(x) for x in os.environ.get("INC_EF", "50,100").split(",")]
FRESH_BASELINE = os.environ.get("INC_FRESH_BASELINE", "1") == "1"
K = 10
M, M0 = 16, 32


def make_data(n: int, d: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    nc = max(32, n // 256)
    centers = (rng.standard_normal((nc, d)) * 4.0).astype(np.float32)
    a = rng.integers(0, nc, size=n)
    out = np.empty((n, d), dtype=np.float32)
    step = 250_000
    for i in range(0, n, step):
        m = min(step, n - i)
        out[i : i + m] = centers[a[i : i + m]] + rng.standard_normal((m, d)).astype(
            np.float32
        )
    return out


def host_gt_ids(data: np.ndarray, ids: np.ndarray, queries: np.ndarray, k: int):
    """Exact cosine top-k item ids on host (blocked BLAS, f32)."""
    qn = np.linalg.norm(queries, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qu = queries / qn
    nq = queries.shape[0]
    best_d = np.full((nq, k), np.inf, dtype=np.float32)
    best_i = np.full((nq, k), -1, dtype=np.int64)
    step = 500_000
    for i in range(0, data.shape[0], step):
        blk = data[i : i + step]
        bn = np.linalg.norm(blk, axis=1)
        bn[bn == 0] = 1.0
        d = (1.0 - (qu @ blk.T) / bn[None, :]) * 0.5
        cd = np.concatenate([best_d, d.astype(np.float32)], axis=1)
        ci = np.concatenate(
            [best_i, np.broadcast_to(ids[i : i + blk.shape[0]], (nq, blk.shape[0]))],
            axis=1,
        )
        sel = np.argpartition(cd, k - 1, axis=1)[:, :k]
        best_d = np.take_along_axis(cd, sel, axis=1)
        best_i = np.take_along_axis(ci, sel, axis=1)
    o = np.argsort(best_d, axis=1, kind="stable")
    return np.take_along_axis(best_i, o, axis=1)


def search_recall(reader, queries, gt, ef, deleted: set):
    metric = reader._graph.metric
    qp = codecs.pack(queries, metric.codec)
    q = jnp.asarray(qp)
    qn = jnp.asarray(distances.np_norms(metric, qp))
    dev = reader._dev
    efu = beam.default_ef_upper(reader.n_items(), ef)
    res = beam.hnsw_search(dev, q, qn, ef, ef_upper=efu)
    jax.device_get(res.dists)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        res = beam.hnsw_search(dev, q, qn, ef, ef_upper=efu)
    jax.device_get(res.dists)
    dt = (time.perf_counter() - t0) / reps
    sl = np.asarray(res.slots)[:, :K]
    ids = reader._graph.ids[np.maximum(sl, 0)].astype(np.int64)
    ids[sl < 0] = -1
    hits = 0
    for b in range(queries.shape[0]):
        got = set(ids[b].tolist())
        assert not (got & deleted), f"deleted item returned: {got & deleted}"
        hits += len(got & set(gt[b].tolist()))
    return hits / (queries.shape[0] * K), queries.shape[0] / dt


def main() -> None:
    path = os.environ.get("INC_PATH") or f"/tmp/inc{N0}"
    print(f"incremental: N0={N0} +{ADD} -{DEL} d={D} efc={EFC} store={path}", flush=True)
    print("calib_pre:", chip_calibration(), flush=True)

    base = make_data(N0, D, seed=42)
    extra = make_data(ADD, D, seed=7)
    rng = np.random.default_rng(3)
    del_ids = rng.choice(N0, size=DEL, replace=False).astype(np.int64)
    queries = make_data(NQ, D, seed=11)

    db = Database(path, Metric.COSINE, map_size=32 << 30)
    w = db.writer(D, m=M, ef=EFC, m0=M0)

    t0 = time.perf_counter()
    step = 250_000
    for i in range(0, N0, step):
        w.add_items(np.arange(i, min(i + step, N0)), base[i : i + step])
    stage0_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    w.build()
    build0_s = time.perf_counter() - t0
    db.commit_rw_txn()
    print(
        f"fresh build: stage {stage0_s:.1f}s + build {build0_s:.1f}s "
        f"({N0 / build0_s:.0f} vec/s)",
        flush=True,
    )

    # ---- the timed incremental round: one txn, journal-driven ----
    w = db.writer(D, m=M, ef=EFC, m0=M0)
    t0 = time.perf_counter()
    w.add_items(np.arange(N0, N0 + ADD), extra)
    for i in del_ids:
        w.del_item(int(i))
    stage1_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    w.build()
    build1_s = time.perf_counter() - t0
    db.commit_rw_txn()
    delta = ADD + DEL
    print(
        f"incremental build (+{ADD}/-{DEL}): stage {stage1_s:.1f}s + "
        f"build {build1_s:.1f}s ({delta / build1_s:.0f} dirty-items/s; a "
        f"full rebuild at fresh speed would be {(N0 + ADD) / (N0 / build0_s):.0f}s)",
        flush=True,
    )

    # ---- recall retention vs exact f32 GT over the surviving corpus ----
    keep = np.ones(N0, dtype=bool)
    keep[del_ids] = False
    all_vecs = np.concatenate([base[keep], extra], axis=0)
    all_ids = np.concatenate(
        [np.arange(N0, dtype=np.int64)[keep], np.arange(N0, N0 + ADD, dtype=np.int64)]
    )
    gt = host_gt_ids(all_vecs, all_ids, queries, K)
    del base, extra, all_vecs

    reader = Reader.open(db, 0)
    reader._graph.check_validity()
    deleted = set(del_ids.tolist())
    rows = []
    for ef in EF_SWEEP:
        rec, qps = search_recall(reader, queries, gt, ef, deleted)
        print(f"incremental index: ef={ef} id-recall@10={rec:.4f} qps={qps:.0f}", flush=True)
        rows.append(
            {
                "bench": f"incremental_{N0}+{ADD}-{DEL}_{D}d_cosine",
                "ef": ef,
                "recall_at_10": round(rec, 4),
                "qps": round(qps, 1),
                "fresh_build_seconds": round(build0_s, 2),
                "incremental_build_seconds": round(build1_s, 2),
                "dirty_items_per_s": round(delta / build1_s, 1),
                "bulk_bf16": distances.BULK_BF16,
                "calib": chip_calibration(),
            }
        )

    if FRESH_BASELINE:
        # parity check: from-scratch build of the same final corpus
        import shutil

        db.close()
        fresh_path = path + "_fresh"
        shutil.rmtree(fresh_path, ignore_errors=True)
        db2 = Database(fresh_path, Metric.COSINE, map_size=32 << 30)
        w2 = db2.writer(D, m=M, ef=EFC, m0=M0)
        base2 = make_data(N0, D, seed=42)
        for i in range(0, N0, step):
            sel = np.arange(i, min(i + step, N0))
            sel = sel[keep[sel]]
            w2.add_items(sel, base2[sel])
        w2.add_items(np.arange(N0, N0 + ADD), make_data(ADD, D, seed=7))
        del base2
        t0 = time.perf_counter()
        w2.build()
        fresh_s = time.perf_counter() - t0
        db2.commit_rw_txn()
        r2 = Reader.open(db2, 0)
        for ef in EF_SWEEP:
            rec, qps = search_recall(r2, queries, gt, ef, deleted)
            print(f"fresh-rebuilt index: ef={ef} id-recall@10={rec:.4f} qps={qps:.0f}", flush=True)
            for row in rows:
                if row["ef"] == ef:
                    row["fresh_rebuild_recall_at_10"] = round(rec, 4)
                    row["fresh_rebuild_seconds"] = round(fresh_s, 2)
        db2.close()
        shutil.rmtree(fresh_path, ignore_errors=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "results_r5.jsonl",
    )
    with open(out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print("calib_post:", chip_calibration(), flush=True)
    print(f"rows appended to {out}", flush=True)


if __name__ == "__main__":
    main()
