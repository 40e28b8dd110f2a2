"""Trace the upper-wave cost of flat vs beam routing-layer candidates.

Runs two builds per variant in one process (rep 0 pays compile, rep 1 is
steady) and prints per-span aggregate wall time for each rep, so the
upper-wave drain can be decomposed under identical chip weather.

Usage: python scripts/trace_upper.py [N] [D]
Env: UF_EFC (48), UF_WAVE (4096)
"""

from __future__ import annotations

import logging
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


class SpanAgg(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    def emit(self, record):
        msg = record.getMessage()
        # "name k=v ... took=XX.XXms"
        if " took=" not in msg:
            return
        name = msg.split(" ", 1)[0]
        ms = float(msg.rsplit("took=", 1)[1][:-2])
        self.totals[name] += ms
        self.counts[name] += 1

    def reset(self):
        self.totals.clear()
        self.counts.clear()

    def dump(self, label):
        print(f"--- spans [{label}] ---", flush=True)
        for name, ms in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            print(f"  {name:28s} {ms/1e3:8.2f}s  n={self.counts[name]}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768

    from hannoy_tpu.build.builder import BuildOptions, build_graph
    from hannoy_tpu.models.hnsw import HostGraph, slot_capacity
    from hannoy_tpu.ops import codecs, distances

    logger = logging.getLogger("hannoy_tpu")
    logger.setLevel(logging.DEBUG)
    agg = SpanAgg()
    logger.addHandler(agg)

    metric = distances.by_name("cosine")
    efc = int(os.environ.get("UF_EFC", 48))
    wave = int(os.environ.get("UF_WAVE", 4096))

    rng = np.random.default_rng(42)
    n_clusters = max(32, n // 256)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    data = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    packed = codecs.pack(data, metric.codec)
    norms = distances.np_norms(metric, packed)
    slots = np.arange(n, dtype=np.int64)

    def stage():
        g = HostGraph.empty(metric, d, 16, 32, capacity=slot_capacity(n))
        for i in range(n):
            g.alloc_slot(i)
        g.vectors[:n] = packed
        g.norms[:n] = norms
        return g

    for label, ufm in (("flat-upper", 65536), ("beam-upper", 0)):
        g = stage()
        for rep in range(2):
            agg.reset()
            if rep:
                g.reset_links()  # steady rebuild: device vector cache warm
            t0 = time.perf_counter()
            build_graph(
                g, slots, np.empty(0, dtype=np.int64),
                BuildOptions(ef_construction=efc, wave_size=wave, upper_flat_max=ufm),
            )
            dt = time.perf_counter() - t0
            print(f"{label} rep{rep}: total={dt:.1f}s", flush=True)
            agg.dump(f"{label} rep{rep}")


if __name__ == "__main__":
    main()
