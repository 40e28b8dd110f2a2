"""Cold-path measurements (VERDICT r4 next #5).

Two stories the reference invests in that only show up in a FRESH process:

  * time-to-first-query: the reference prefetches the mmap'd graph on
    ``Reader::open`` (reader.rs:446-543, ~100 LoC of madvise + BFS)
    because cold readers matter. Our analogue is HostGraph.load (host
    store read) + the HBM upload + the first XLA compile/executable-load.
  * cold build: BENCH_r04 graded the cold 100k build at 0.56x the CPU
    baseline. The persistent compilation cache (hannoy_tpu/__init__) is
    supposed to make the compile storm one-time — run this script twice
    in fresh processes and compare.

Usage (each invocation is ONE fresh process — run via a driver shell):
  python scripts/cold_paths.py build100k          # cold build breakdown
  COLD_PATH=/tmp/inc1000000 python scripts/cold_paths.py open
                                                  # time-to-first-query
Rows append to benchmarks/results_r5.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_T0 = time.perf_counter()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_T_JAX = time.perf_counter() - _T0

from hannoy_tpu import Database, Metric, Reader  # noqa: E402
from hannoy_tpu.build.builder import BuildOptions, build_graph  # noqa: E402
from hannoy_tpu.models.hnsw import HostGraph, slot_capacity, to_device  # noqa: E402
from hannoy_tpu.ops import beam, codecs, distances  # noqa: E402

_T_IMPORT = time.perf_counter() - _T0

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "results_r5.jsonl",
)


def _emit(row: dict) -> None:
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _cache_entries() -> int:
    d = jax.config.jax_compilation_cache_dir
    try:
        return len(os.listdir(d))
    except OSError:
        return -1


def build100k() -> None:
    n, d, m, m0, efc = 100_000, 768, 16, 32, 96
    rng = np.random.default_rng(42)
    nc = max(32, n // 256)
    centers = rng.standard_normal((nc, d)).astype(np.float32) * 4.0
    a = rng.integers(0, nc, size=n)
    data = (centers[a] + rng.standard_normal((n, d))).astype(np.float32)
    metric = distances.by_name("cosine")
    t_stage0 = time.perf_counter()
    g = HostGraph.empty(metric, d, m, m0, capacity=slot_capacity(n))
    packed = codecs.pack(data, metric.codec)
    for i in range(n):
        g.alloc_slot(i)
    g.vectors[:n] = packed
    g.norms[:n] = distances.np_norms(metric, packed)
    stage_s = time.perf_counter() - t_stage0

    cache_before = _cache_entries()
    t0 = time.perf_counter()
    build_graph(
        g, np.arange(n, dtype=np.int64), np.empty(0, dtype=np.int64),
        BuildOptions(ef_construction=efc, wave_size=4096),
    )
    cold_s = time.perf_counter() - t0
    g.reset_links()
    t0 = time.perf_counter()
    build_graph(
        g, np.arange(n, dtype=np.int64), np.empty(0, dtype=np.int64),
        BuildOptions(ef_construction=efc, wave_size=4096),
    )
    steady_s = time.perf_counter() - t0
    _emit(
        {
            "bench": "cold_build_100000x768_cosine",
            "import_jax_s": round(_T_JAX, 2),
            "import_total_s": round(_T_IMPORT, 2),
            "host_stage_s": round(stage_s, 2),
            "build_cold_s": round(cold_s, 2),
            "build_steady_s": round(steady_s, 2),
            "cold_overhead_s": round(cold_s - steady_s, 2),
            "compile_cache_entries_before": cache_before,
            "compile_cache_entries_after": _cache_entries(),
            "bulk_bf16": distances.BULK_BF16,
        }
    )


def open_path() -> None:
    path = os.environ.get("COLD_PATH", "/tmp/inc1000000")
    metric_name = os.environ.get("COLD_METRIC", "cosine")
    t0 = time.perf_counter()
    db = Database(path, {"cosine": Metric.COSINE, "euclidean": Metric.EUCLIDEAN}[metric_name])
    open_db_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = Reader.open(db, 0)  # HostGraph.load + full HBM upload
    open_reader_s = time.perf_counter() - t0
    n = r.n_items()
    d = r.dimensions()
    rng = np.random.default_rng(1)
    q1 = rng.standard_normal((1, d)).astype(np.float32)

    t0 = time.perf_counter()
    res = r.nns(10).ef_search(50).by_vectors(q1)
    first_query_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = r.nns(10).ef_search(50).by_vectors(q1)
    steady_query_s = time.perf_counter() - t0
    assert res[0].nns
    _emit(
        {
            "bench": f"time_to_first_query_{n}x{d}_{metric_name}",
            "import_jax_s": round(_T_JAX, 2),
            "import_total_s": round(_T_IMPORT, 2),
            "open_db_s": round(open_db_s, 3),
            "open_reader_s": round(open_reader_s, 2),
            "first_query_s": round(first_query_s, 2),
            "steady_query_s": round(steady_query_s, 4),
            "time_to_first_result_s": round(
                _T_IMPORT + open_db_s + open_reader_s + first_query_s, 2
            ),
            "n_items": n,
        }
    )
    db.close()


if __name__ == "__main__":
    {"build100k": build100k, "open": open_path}[sys.argv[1]]()
