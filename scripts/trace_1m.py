"""Fenced span trace of a 1M×768 cosine default build on the real chip.

Reproduces benchmarks/logs/trace_1m_spans.txt for the current code: runs
the bench.py staging + build twice (cold absorbs the compile storm, the
second build is the steady trace) with HANNOY_TPU_FENCE_WAVES=1 and DEBUG
spans, then prints an aggregated span table for the steady build only.

Usage: HANNOY_TPU_FENCE_WAVES=1 python scripts/trace_1m.py
Env: TRACE_N (default 1_000_000), TRACE_D (768), TRACE_EFC (96).
"""

from __future__ import annotations

import logging
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hannoy_tpu.build.builder import BuildOptions, build_graph
from hannoy_tpu.models.hnsw import HostGraph, slot_capacity
from hannoy_tpu.ops import codecs, distances

N = int(os.environ.get("TRACE_N", 1_000_000))
D = int(os.environ.get("TRACE_D", 768))
EFC = int(os.environ.get("TRACE_EFC", 96))
M, M0 = 16, 32


class SpanCollector(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.rows = []
        self.enabled = False

    def emit(self, record):
        if not self.enabled:
            return
        m = re.match(r"(\S+).*took=([0-9.]+)ms", record.getMessage())
        if m:
            self.rows.append((m.group(1), float(m.group(2))))


def main() -> None:
    logger = logging.getLogger("hannoy_tpu")
    logger.setLevel(logging.DEBUG)
    col = SpanCollector()
    logger.addHandler(col)

    rng = np.random.default_rng(42)
    nc = max(32, N // 256)
    centers = rng.standard_normal((nc, D)).astype(np.float32) * 4.0
    a = rng.integers(0, nc, size=N)
    data = np.empty((N, D), dtype=np.float32)
    step = 500_000
    for i in range(0, N, step):
        m = min(step, N - i)
        data[i : i + m] = centers[a[i : i + m]] + rng.standard_normal((m, D))

    metric = distances.by_name("cosine")
    g = HostGraph.empty(metric, D, M, M0, capacity=slot_capacity(N))
    packed = codecs.pack(data, metric.codec)
    for i in range(N):
        g.alloc_slot(i)
    g.vectors[:N] = packed
    g.norms[:N] = distances.np_norms(metric, packed)
    slots = np.arange(N, dtype=np.int64)

    opts = BuildOptions(ef_construction=EFC, wave_size=4096)
    t0 = time.perf_counter()
    build_graph(g, slots, np.empty(0, dtype=np.int64), opts)
    print(f"cold build: {time.perf_counter() - t0:.1f}s", flush=True)

    g.reset_links()
    col.enabled = True
    t0 = time.perf_counter()
    build_graph(g, slots, np.empty(0, dtype=np.int64), opts)
    steady = time.perf_counter() - t0
    col.enabled = False
    print(f"steady build: {steady:.1f}s  bulk_bf16={distances.BULK_BF16}", flush=True)

    agg = defaultdict(lambda: [0.0, 0, 0.0])
    for name, ms in col.rows:
        a_ = agg[name]
        a_[0] += ms / 1e3
        a_[1] += 1
        a_[2] = max(a_[2], ms / 1e3)
    print(f"{'span':<28}{'total_s':>9}{'n':>6}{'max_s':>9}")
    for name, (tot, n, mx) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"{name:<28}{tot:>9.1f}{n:>6}{mx:>9.1f}")


if __name__ == "__main__":
    main()
