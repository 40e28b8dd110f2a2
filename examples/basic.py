"""End-to-end example: add → build → search.

The hannoy-tpu equivalent of the reference's example app
(/root/reference/example/src/main.rs:5-41): create a database, insert a
handful of vectors inside a writer transaction, build, then query.

Run: python examples/basic.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hannoy_tpu import Database, Metric


def main() -> None:
    rng = np.random.default_rng(42)
    dims, n = 64, 1000
    vectors = rng.standard_normal((n, dims)).astype(np.float32)

    with tempfile.TemporaryDirectory() as path:
        db = Database(path, Metric.COSINE)

        # the writer context manager builds the HNSW graph and commits on exit
        with db.writer(dimensions=dims, m=16, ef=100) as writer:
            writer.add_items(range(n), vectors)

        reader = db.reader()
        query = vectors[123]
        for item_id, dist in reader.by_vec(query, n=5, ef_search=100):
            print(f"item {item_id:4d}  distance {dist:.4f}")

        # batched search is the TPU-native throughput path
        batch = reader.by_vecs(vectors[:32], n=3)
        hits = sum(1 for i, row in enumerate(batch) if row and row[0][0] == i)
        print(f"batched self-search: {hits}/32 exact hits")


if __name__ == "__main__":
    main()
