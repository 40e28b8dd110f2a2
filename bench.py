"""Headline benchmark: build + search 100k × 768d cosine on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline (BASELINE.md, datacomp-small 768d, 100K rows, 8-core i7-6900K):
  hannoy build 31.51 s (3173 vec/s), search 15.73 ms/query at recall@10
  0.93 with ef=200 → 63.6 QPS single-threaded.

Our headline metric is batched QPS at recall@10 >= 0.93 (same recall bar,
same k), measured against exact ground truth computed on device. Build
throughput is reported alongside.

Env knobs: HANNOY_BENCH_N (default 100000), HANNOY_BENCH_D (768),
HANNOY_BENCH_Q (256 queries per batch), HANNOY_BENCH_EF (sweep list).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from hannoy_tpu.build.builder import BuildOptions, build_graph
from hannoy_tpu.models.flat import flat_topk
from hannoy_tpu.models.hnsw import HostGraph, slot_capacity, to_device
from hannoy_tpu.ops import beam, codecs, distances

#: reference rows per metric: {metric: [(n, build_seconds, latency_ms), ...]}
#: (datacomp-small 768d, M=24 efc=512 ef=200 — BASELINE.md /
#: /root/reference/docs/benchmarks/cosine_hamming.md:10-25). vs_baseline
#: picks the row nearest in log-N so a 1M run is compared against the
#: reference's own 1M numbers, and hamming against hamming (ADVICE r3).
BASELINES = {
    "cosine": [
        (10_000, 1.16, 9.53),
        (100_000, 31.51, 15.73),
        (1_000_000, 506.41, 29.89),
        (10_000_000, 7216.37, 53.28),
    ],
    "hamming": [
        (10_000, 1.13, 13.19),
        (50_000, 9.10, 17.57),
        (100_000, 22.77, 19.56),
        (500_000, 186.54, 29.10),
        (1_000_000, 418.03, 32.90),
    ],
    "binary quantized cosine": [
        (100_000, 43.77, 22.91),
        (1_000_000, 648.22, 36.67),
    ],
}


def baseline_for(metric_name: str, n: int) -> tuple[float, float]:
    """(build vec/s, qps) of the reference row nearest in log-N."""
    import math

    rows = BASELINES.get(metric_name, BASELINES["cosine"])
    bn, build_s, lat_ms = min(rows, key=lambda r: abs(math.log(r[0]) - math.log(n)))
    return bn / build_s, 1000.0 / lat_ms


RECALL_BAR = 0.93
K = 10
#: quiet-chip HBM stream reference (measured round 2, scripts/profile_build.py)
QUIET_HBM_GBPS = 369.0


def chip_calibration() -> dict:
    """Measure chip health so BENCH_r0N regressions are attributable.

    The bench chip is shared with unrelated workloads and runs 2-3×
    slower under contention (BENCH_NOTES.md chip-variance datum), so each
    run self-reports (a) raw HBM read+write stream bandwidth and (b) the
    per-dispatch round-trip through the (possibly remote) runtime.
    ``speed_frac`` ≈ 1.0 means a quiet chip; ≪1 means the absolute
    timings in the same JSON are contaminated by a noisy neighbor.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.ones((32, 1024, 1024), jnp.float32)  # 128 MiB
    reps = 16

    @jax.jit
    def stream(x):
        def body(i, acc):
            return acc + x * (1.0 + i.astype(jnp.float32) * 1e-9)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))[0, 0]

    @jax.jit
    def nop(i):
        return i + 1

    jax.device_get(nop(jnp.int32(0)))
    t0 = time.perf_counter()
    rtt_reps = 5
    for i in range(rtt_reps):
        jax.device_get(nop(jnp.int32(i)))
    rtt_s = (time.perf_counter() - t0) / rtt_reps

    jax.device_get(stream(x))  # compile + warm
    t0 = time.perf_counter()
    jax.device_get(stream(x))
    dt = time.perf_counter() - t0
    # per rep: read x + read acc + write acc = 3 × 128 MiB. Subtract the
    # tunnel RTT first: through the axon remote runtime the per-dispatch
    # round trip (~30 ms) is the same order as the stream's on-chip time
    # (~17 ms quiet), so the raw quotient under-reads bandwidth ~2x and
    # speed_frac would flag a quiet chip as contended (found round 4:
    # every r3/r4 row logged speed_frac 0.41-0.54 with rtt ≈ dt).
    gbps = 3 * x.nbytes * reps / max(dt - rtt_s, 1e-4) / 1e9

    return {
        "hbm_gbps": round(gbps, 1),
        "dispatch_rtt_ms": round(rtt_s * 1000.0, 2),
        "speed_frac": round(min(gbps / QUIET_HBM_GBPS, 1.0), 3),
    }


def main() -> None:
    n = int(os.environ.get("HANNOY_BENCH_N", 100_000))
    d = int(os.environ.get("HANNOY_BENCH_D", 768))
    n_queries = int(os.environ.get("HANNOY_BENCH_Q", 256))
    ef_sweep = [int(x) for x in os.environ.get("HANNOY_BENCH_EF", "50,100,200").split(",")]
    m, m0 = 16, 32
    efc = int(os.environ.get("HANNOY_BENCH_EFC", 48 if n <= 200_000 else 96))
    wave = int(os.environ.get("HANNOY_BENCH_WAVE", 4096))

    metric = distances.by_name(
        os.environ.get("HANNOY_BENCH_METRIC", "cosine").replace("_", " ")
    )
    # build-tuning knobs (defaults = BuildOptions defaults)
    chain = os.environ.get("HANNOY_BENCH_CHAIN", "0") == "1"
    refine = os.environ.get("HANNOY_BENCH_REFINE")
    refine = int(refine) if refine else None
    expand = int(os.environ.get("HANNOY_BENCH_EXPAND", 1))
    biters = os.environ.get("HANNOY_BENCH_BITERS")
    biters = int(biters) if biters else None
    tail = float(os.environ.get("HANNOY_BENCH_TAIL", 0.05))
    trav = os.environ.get("HANNOY_BENCH_TRAVERSE")
    trav = int(trav) if trav else None
    bulk_k = os.environ.get("HANNOY_BENCH_BULK_K")
    bulk_k = int(bulk_k) if bulk_k else None
    rng = np.random.default_rng(42)
    # clustered synthetic data: mixture of gaussians, matching the local
    # structure of real embedding corpora (pure isotropic gaussian 768-d is
    # the known adversarial case for every graph-ANN method)
    n_clusters = max(32, n // 256)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    data = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    q_assign = rng.integers(0, n_clusters, size=n_queries)
    queries = (centers[q_assign] + rng.standard_normal((n_queries, d))).astype(np.float32)

    # ---- chip health before any heavy work ----
    calib_pre = chip_calibration()

    # ---- stage ----
    g = HostGraph.empty(metric, d, m, m0, capacity=slot_capacity(n))
    packed = codecs.pack(data, metric.codec)
    norms = distances.np_norms(metric, packed)
    slots = np.arange(n, dtype=np.int64)
    for i in range(n):
        g.alloc_slot(i)
    g.vectors[:n] = packed
    g.norms[:n] = norms

    # ---- build (timed twice: cold includes XLA compiles + executable
    # loads through the remote TPU runtime; steady is the recurring cost
    # an operator pays per (re)build — reported as the headline) ----
    def _opts():
        return BuildOptions(
            ef_construction=efc, wave_size=wave, chain_seeding=chain,
            refine_iters=refine, beam_expand=expand, beam_iters=biters,
            beam_tail_frac=tail, traverse=trav, bulk_k=bulk_k,
        )

    t0 = time.perf_counter()
    build_graph(g, slots, np.empty(0, dtype=np.int64), _opts())
    build_cold_s = time.perf_counter() - t0

    # steady rebuild = the operator's recurring cost: same Database, links
    # dropped, vectors already resident in HBM (the device vector cache —
    # exactly what Writer.force_rebuild pays on a live index). The cold
    # number above additionally carries XLA compiles, executable loads and
    # the full 400 MB vector upload through the (possibly remote) runtime.
    g.reset_links()
    t0 = time.perf_counter()
    build_graph(g, slots, np.empty(0, dtype=np.int64), _opts())
    build_s = time.perf_counter() - t0
    build_vps = n / build_s

    dev = to_device(g, serve_only=True)
    qp = codecs.pack(queries, metric.codec)
    q = jnp.asarray(qp)
    qn = jnp.asarray(distances.np_norms(metric, qp))

    # ---- exact ground truth on device ----
    exact_d, _ = flat_topk(metric.name, q, qn, dev.vectors, dev.norms, dev.valid, K)
    exact_d = np.asarray(exact_d)
    thresh = exact_d[:, K - 1 : K] + 1e-6

    # ---- ef sweep: find QPS at the recall bar ----
    results = {}
    chosen = None
    for ef in ef_sweep:
        efu = beam.default_ef_upper(n, ef)  # the Reader's shipped default
        res = beam.hnsw_search(dev, q, qn, ef, ef_upper=efu)
        jax.block_until_ready(res.dists)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            res = beam.hnsw_search(dev, q, qn, ef, ef_upper=efu)
        jax.block_until_ready(res.dists)
        dt = (time.perf_counter() - t0) / reps
        found = np.asarray(res.dists)[:, :K]
        recall = float((found <= thresh).mean())
        qps = n_queries / dt
        results[ef] = (recall, qps)
        if recall >= RECALL_BAR and chosen is None:
            chosen = ef
    failed = chosen is None
    if failed:
        chosen = max(ef_sweep)
    recall, qps = results[chosen]

    # ---- B=1 per-query latency at the chosen ef (VERDICT r4 #4b). The
    # reference's headline unit is ms/query (arroy_hannoy.md:20: 29.89 ms
    # at 1M); batched QPS alone hides the serving tail. Fence via
    # jax.device_get (block_until_ready is not reliable through the axon
    # tunnel, CLAUDE.md); the ~30 ms dispatch RTT is part of the honest
    # number here and reported separately in calib_pre.dispatch_rtt_ms.
    lat_reps = int(os.environ.get("HANNOY_BENCH_LAT_REPS", 30))
    efu1 = beam.default_ef_upper(n, chosen)
    jax.device_get(beam.hnsw_search(dev, q[:1], qn[:1], chosen, ef_upper=efu1).dists)
    lats = []
    for i in range(lat_reps):
        j = i % n_queries
        t0 = time.perf_counter()
        r1 = beam.hnsw_search(dev, q[j : j + 1], qn[j : j + 1], chosen, ef_upper=efu1)
        jax.device_get(r1.dists)
        lats.append((time.perf_counter() - t0) * 1000.0)
    lat_p50 = float(np.percentile(lats, 50))
    lat_p99 = float(np.percentile(lats, 99))
    base_build_vps, base_qps = baseline_for(metric.name, n)
    name = f"qps_at_recall10_{RECALL_BAR}_{metric.name.replace(' ', '-')}_{n}x{d}"
    if failed:
        # a run that misses the recall bar must be unmistakable — both in
        # the metric name and as a machine-readable flag (VERDICT r3 #3)
        name = "FAILED_" + name
    row = json.dumps(
            {
                "metric": name,
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / base_qps, 2),
                "failed_recall_bar": failed,
                "recall_at_10": round(recall, 4),
                "ef": chosen,
                "build_seconds": round(build_s, 2),
                "build_cold_seconds": round(build_cold_s, 2),
                "build_vectors_per_s": round(build_vps, 1),
                "build_vs_baseline": round(build_vps / base_build_vps, 2),
                "build_cold_vs_baseline": round((n / build_cold_s) / base_build_vps, 2),
                "sweep": {str(e): [round(r, 4), round(s, 1)] for e, (r, s) in results.items()},
                "latency_b1_p50_ms": round(lat_p50, 2),
                "latency_b1_p99_ms": round(lat_p99, 2),
                # reference latency row nearest in log-N (ms/query)
                "latency_vs_baseline": round((1000.0 / base_qps) / lat_p50, 2),
                # always emitted (true OR false) so rows are unambiguous
                # about the flag state they ran under (ADVICE r4)
                "bulk_bf16": distances.BULK_BF16,
                "calib_pre": calib_pre,
                "calib_post": chip_calibration(),
                "device": str(jax.devices()[0]),
            }
    )
    print(row)
    # record the run (driver contract stays ONE stdout JSON line)
    if os.environ.get("HANNOY_BENCH_RECORD", "1") == "1":
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "results_r5.jsonl")
        try:
            with open(out, "a") as f:
                f.write(row + "\n")
        except OSError:
            pass


if __name__ == "__main__":
    main()
