"""Measure neighbor-block locality — the go/no-go datum for the
superblock-DMA beam gather (VERDICT r3 #5 / NEXT_ROUND backlog #1).

The beam hop's row gather runs at a ~42 ns/row issue-bound floor
(BENCH_NOTES round 2); fetching B-row contiguous superblocks per DMA
beats it only if the workload's rows cluster into blocks: with locality
factor L = needed_rows / touched_blocks(B), the byte volume grows B/L×
while the issue count falls L×. On a ~370 GB/s part with a 3 KB row and
a ~5.5 ms/hop floor at 131k rows, the hop time under superblocks is
  max(issue: 131k/L × 50 ns, bytes: 131k × B/L × 3 KB / 370 GB/s)
so L ≥ ~2 at B=8 is the break-even and L ≥ 4 gives ~2.6×.

This script builds the bulk graph at N with cluster-locality renumbering
(BuildOptions.bulk_renumber — neighbors land in HBM-adjacent rows) and
measures L for block sizes 4/8/16/32 under two workloads:
  * build-hop: 4096 random live rows' full link rows (the wave gather),
  * search-hop: the link rows of 256 real queries' beam pools at ef=50
    (what hnsw_search gathers mid-beam).

Usage: python scripts/measure_locality.py N [D]   (env: LOC_CPU=1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("LOC_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def locality(needed_rows: np.ndarray, block: int) -> tuple[float, float]:
    """(L, projected_hop_ms) for contiguous blocks of ``block`` rows."""
    rows = np.unique(needed_rows[needed_rows >= 0])
    blocks = np.unique(rows // block)
    L = len(rows) / max(len(blocks), 1)
    issue_ms = len(blocks) * 50e-9 * 1e3
    bytes_ms = len(blocks) * block * 3072 / 370e9 * 1e3
    return L, max(issue_ms, bytes_ms)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    import jax.numpy as jnp

    from bisect_recall import gen_data
    from check_bulk import build
    from hannoy_tpu.models.hnsw import to_device
    from hannoy_tpu.ops import beam, distances

    data, queries = gen_data(n, d)
    efc = int(os.environ.get("BISECT_EFC", 48 if n <= 200_000 else 96))
    g, stats, dt = build(
        data, distances.COSINE, dict(ef_construction=efc, bulk_renumber=True)
    )
    out = {"n": n, "d": d, "build_s": round(dt, 1), "renumbered": True}
    rng = np.random.default_rng(3)
    live = np.nonzero(g.levels >= 0)[0]

    # build-hop workload
    wave = rng.choice(live, size=4096, replace=False)
    needed = g.links0[wave].reshape(-1)
    u = np.unique(needed[needed >= 0]).size
    out["build_hop_rows"] = int(u)
    out["build_hop_baseline_ms"] = round(u * 42e-9 * 1e3, 2)
    out["build_hop"] = {
        str(b): [round(v, 2) for v in locality(needed, b)] for b in (4, 8, 16, 32)
    }

    # search-hop workload: gather rows of real ef=50 pools
    dev = to_device(g)
    import jax

    qj = jnp.asarray(queries)
    qnj = jnp.asarray(distances.np_norms(distances.COSINE, queries))
    res = beam.hnsw_search(dev, qj, qnj, 50)
    pool = np.asarray(jax.device_get(res.slots)).reshape(-1)
    needed_s = g.links0[np.maximum(pool, 0)].reshape(-1)
    needed_s = np.where((pool >= 0).repeat(g.links0.shape[1]), needed_s, -1)
    out["search_hop"] = {
        str(b): [round(v, 2) for v in locality(needed_s, b)] for b in (4, 8, 16, 32)
    }
    # how many rows a search hop actually touches (for scaling the model)
    out["search_rows"] = int((np.unique(needed_s[needed_s >= 0])).size)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
