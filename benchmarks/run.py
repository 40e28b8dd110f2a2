"""Dataset benchmark runner: build throughput + recall-vs-QPS curves.

The TPU analogue of the reference's external harness
(meilisearch/vector-store-relevancy-benchmark — arroy_hannoy.md:2) plus its
in-repo divan benches (benches/benchmark.rs, benches/speed.rs): one run
builds an index over a dataset, sweeps ef_search, and reports recall@k
against exact ground truth (provided by the dataset or computed on device)
with batched QPS per point.

Usage:
  python benchmarks/run.py --dataset synthetic-hard:n=100000,d=768 \
      --m 16 --efc 48 --ef 50,100,200 [--out results.jsonl]

Real-corpus specs (files required on disk, see benchmarks/datasets.py):
  --dataset sift1m:/data/sift
  --dataset hdf5:/data/glove-100-angular.hdf5
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks import datasets as ds
from hannoy_tpu.build.builder import BuildOptions, build_graph
from hannoy_tpu.models.flat import flat_topk
from hannoy_tpu.models.hnsw import HostGraph, slot_capacity, to_device
from hannoy_tpu.ops import beam, codecs, distances


def stage(dataset: ds.Dataset, m: int, m0: int) -> tuple[HostGraph, np.ndarray]:
    metric = distances.by_name(dataset.metric_name)
    n, d = dataset.train.shape
    g = HostGraph.empty(metric, d, m, m0, capacity=slot_capacity(n))
    packed = codecs.pack(dataset.train, metric.codec)
    g.norms[:n] = distances.np_norms(metric, packed)
    for i in range(n):
        g.alloc_slot(i)
    g.vectors[:n] = packed
    return g, np.arange(n, dtype=np.int64)


def exact_topk_device(metric, dev, q, qn, k: int, block: int = 512) -> np.ndarray:
    """Exact neighbor row indices on device (recall oracle)."""
    out = []
    for s in range(0, q.shape[0], block):
        d, idx = flat_topk(
            metric.name, q[s : s + block], qn[s : s + block], dev.vectors, dev.norms, dev.valid, k
        )
        out.append(np.asarray(idx))
    return np.concatenate(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--m0", type=int, default=None)
    ap.add_argument("--efc", type=int, default=48)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument(
        "--bulk", choices=("auto", "on", "off"), default="auto",
        help="cluster-blocked fresh-build path (build/bulk.py)",
    )
    ap.add_argument("--wave", type=int, default=4096)
    ap.add_argument("--ef", default="50,100,200")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--steady", action="store_true", help="build twice, report the warm build")
    args = ap.parse_args()

    dataset = ds.resolve(args.dataset)
    metric = distances.by_name(dataset.metric_name)
    m0 = args.m0 or 2 * args.m
    n, d = dataset.train.shape
    k = args.k
    queries = dataset.queries[: args.queries]

    bulk = {"auto": None, "on": True, "off": False}[args.bulk]
    builds = 2 if args.steady else 1
    for b in range(builds):
        g, slots = stage(dataset, args.m, m0)
        t0 = time.perf_counter()
        build_graph(
            g, slots, np.empty(0, dtype=np.int64),
            BuildOptions(
                ef_construction=args.efc, wave_size=args.wave,
                alpha=args.alpha, bulk=bulk,
            ),
        )
        build_s = time.perf_counter() - t0
        if b == 0:
            build_cold_s = build_s

    dev = to_device(g, serve_only=True)
    qp = codecs.pack(queries, metric.codec)
    q = jnp.asarray(qp)
    qn = jnp.asarray(distances.np_norms(metric, qp))

    if dataset.ground_truth is not None:
        gt = dataset.ground_truth[: args.queries, :k]
    else:
        gt = exact_topk_device(metric, dev, q, qn, k)

    curve = []
    for ef in (int(x) for x in args.ef.split(",")):
        res = beam.hnsw_search(dev, q, qn, ef)
        jax.block_until_ready(res.dists)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            res = beam.hnsw_search(dev, q, qn, ef)
        found = np.asarray(res.slots)[:, :k]  # forces completion
        dt = (time.perf_counter() - t0) / reps
        inter = np.asarray(
            [len(set(found[i].tolist()) & set(gt[i].tolist())) for i in range(found.shape[0])]
        )
        recall = float(inter.mean()) / k
        curve.append({"ef": ef, "recall_at_k": round(recall, 4), "qps": round(found.shape[0] / dt, 1),
                      "ms_per_batch": round(dt * 1e3, 2)})

    result = {
        "dataset": dataset.name,
        "metric": dataset.metric_name,
        "synthetic": dataset.synthetic,
        "n": n,
        "d": d,
        "m": args.m,
        "m0": m0,
        "ef_construction": args.efc,
        "alpha": args.alpha,
        "bulk": args.bulk,
        "k": k,
        "n_queries": int(queries.shape[0]),
        "build_seconds": round(build_s, 2),
        "build_cold_seconds": round(build_cold_s, 2),
        "build_vectors_per_s": round(n / build_s, 1),
        "curve": curve,
        "device": str(jax.devices()[0]),
    }
    try:
        from bench import chip_calibration

        result["calib"] = chip_calibration()
    except Exception:
        pass
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
