"""Stateful fuzz: random add/del batches → build → invariants.

Port of the reference's fuzzer (src/tests/fuzz.rs:79-146): a time-boxed
loop of randomly generated Add/Delete batches, building after each batch
and asserting
  (1) every live item is reachable via search k = n (fuzz.rs:31-37), and
  (2) no deleted item or edge to one survives anywhere (fuzz.rs:39-77).

Duration via HANNOY_FUZZ_DURATION_SEC (default 15 s here; the reference
runs 20 s locally, 1800 s in CI).
"""

import os
import time

import numpy as np

import jax.numpy as jnp

from hannoy_tpu import Database, Metric


def test_random_read_writes(tmp_path, rng):
    duration = float(os.environ.get("HANNOY_FUZZ_DURATION_SEC", "15"))
    d = 8
    db = Database(tmp_path / "fuzz", Metric.EUCLIDEAN)
    live: dict[int, np.ndarray] = {}
    deadline = time.monotonic() + duration
    rounds = 0

    while time.monotonic() < deadline or rounds == 0:
        w = db.writer(d, m=4, ef=24)
        n_add = int(rng.integers(0, 40))
        n_del = int(rng.integers(0, 20))
        for _ in range(n_add):
            item = int(rng.integers(0, 120))
            vec = rng.standard_normal(d).astype(np.float32)
            w.add_item(item, vec)
            live[item] = vec
        for _ in range(n_del):
            item = int(rng.integers(0, 120))
            if w.del_item(item):
                live.pop(item, None)
        w.builder().wave_size(32).build()
        db.commit_rw_txn()
        rounds += 1

        reader = db.reader()
        reader.assert_validity()  # store-level: items==metadata, no dangling
        assert reader.n_items() == len(live)
        if live:
            # every item reachable (reference fuzz.rs:31-37)
            got = reader.by_vec(np.zeros(d, np.float32), n=len(live), ef_search=4 * len(live))
            assert {i for i, _ in got} == set(live), "unreachable items"
            # deleted items never come back
            some = next(iter(live.values()))
            for i, _ in reader.by_vec(some, n=min(10, len(live))):
                assert i in live
    assert rounds >= 1
