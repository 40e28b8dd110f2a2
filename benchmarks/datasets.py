"""Benchmark dataset loaders + hard-synthetic generators.

The reference's published numbers are on real corpora (datacomp/wikipedia/
ada-002 — /root/reference/docs/benchmarks/arroy_hannoy.md:2) and
BASELINE.json names SIFT1M / GloVe-100 / Deep-10M. This module loads the
standard distribution formats for those corpora when the files are present:

* TEXMEX ``.fvecs``/``.ivecs``/``.bvecs`` (SIFT1M, Deep) — ftp.irisa.fr layout
* ann-benchmarks ``.hdf5`` (glove-100-angular, sift-128-euclidean, …)

The build/bench environment for this repo has **zero network egress**, so
when no files are on disk the harness falls back to ``synthetic-hard``:
a generator engineered to reproduce the properties that make real
embedding corpora hard for graph ANN — hierarchical cluster structure
with Zipf-distributed cluster sizes, anisotropic power-law covariance
spectrum (real text/image embeddings concentrate variance in a few
hundred directions), and out-of-cluster noise queries. This is strictly
*harder* than the isotropic clustered mixture in bench.py and is labeled
as synthetic in every artifact it produces.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Dataset:
    name: str
    metric_name: str  # hannoy distance name ("cosine", "euclidean", ...)
    train: np.ndarray  # [N, D] float32
    queries: np.ndarray  # [Q, D] float32
    ground_truth: Optional[np.ndarray] = None  # [Q, >=k] int32 row indices into train
    synthetic: bool = False


# --------------------------------------------------------------------------
# TEXMEX formats (SIFT1M et al): each record = i32 dim ∥ dim elements
# --------------------------------------------------------------------------


def read_fvecs(path: str, max_n: Optional[int] = None) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.int32)
    d = int(raw[0])
    raw = raw.reshape(-1, d + 1)
    if max_n:
        raw = raw[:max_n]
    return raw[:, 1:].view(np.float32).copy()


def read_ivecs(path: str, max_n: Optional[int] = None) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.int32)
    d = int(raw[0])
    raw = raw.reshape(-1, d + 1)
    if max_n:
        raw = raw[:max_n]
    return raw[:, 1:].copy()


def read_bvecs(path: str, max_n: Optional[int] = None) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.uint8)
    d = int(raw[:4].view(np.int32)[0])
    rec = 4 + d
    raw = raw.reshape(-1, rec)
    if max_n:
        raw = raw[:max_n]
    return raw[:, 4:].astype(np.float32)


def load_texmex(base_dir: str, name: str, metric: str, max_n: Optional[int] = None) -> Dataset:
    """Load a TEXMEX-layout dir: {name}_base.fvecs / _query.fvecs /
    _groundtruth.ivecs (SIFT1M: metric=euclidean)."""
    base = read_fvecs(os.path.join(base_dir, f"{name}_base.fvecs"), max_n)
    queries = read_fvecs(os.path.join(base_dir, f"{name}_query.fvecs"))
    gt_path = os.path.join(base_dir, f"{name}_groundtruth.ivecs")
    gt = read_ivecs(gt_path) if (os.path.exists(gt_path) and not max_n) else None
    return Dataset(name, metric, base, queries, gt)


# --------------------------------------------------------------------------
# ann-benchmarks HDF5 (glove-100-angular, sift-128-euclidean, ...)
# --------------------------------------------------------------------------


def load_ann_benchmarks(path: str, max_n: Optional[int] = None) -> Dataset:
    import h5py  # baked into the image

    with h5py.File(path, "r") as f:
        train = np.asarray(f["train"], dtype=np.float32)
        queries = np.asarray(f["test"], dtype=np.float32)
        gt = np.asarray(f["neighbors"], dtype=np.int32) if "neighbors" in f else None
        distance = f.attrs.get("distance", "euclidean")
    if max_n:
        train = train[:max_n]
        gt = None  # row indices no longer valid
    metric = {"angular": "cosine", "euclidean": "euclidean", "hamming": "hamming"}[
        str(distance)
    ]
    return Dataset(os.path.basename(path), metric, train, queries, gt)


# --------------------------------------------------------------------------
# Hard synthetic (zero-egress fallback)
# --------------------------------------------------------------------------


def synthetic_hard(
    n: int,
    d: int,
    n_queries: int = 1000,
    metric: str = "cosine",
    seed: int = 42,
    spectrum_decay: float = 0.6,
    roots: int = 48,
) -> Dataset:
    """Embedding-corpus-like synthetic data.

    Properties matched to real text/image embedding corpora:
    * hierarchical topics: ``roots`` root clusters, each split into
      subclusters, sizes Zipf-distributed (a few huge topics, a long tail);
    * anisotropic covariance with a power-law eigenvalue spectrum
      (λ_i ∝ (i+1)^-decay) — variance concentrates in a few hundred
      directions, the regime where high-d graph ANN is hardest;
    * queries drawn from the same process but *not* from train rows, with
      10% drawn from unseen topics (out-of-distribution probes).
    """
    rng = np.random.default_rng(seed)
    # shared anisotropy: rotate a power-law-scaled basis
    spectrum = (np.arange(1, d + 1, dtype=np.float32)) ** (-spectrum_decay)
    basis, _ = np.linalg.qr(rng.standard_normal((d, d)).astype(np.float32))
    W = (basis * spectrum[None, :]).astype(np.float32)  # columns scaled

    def sample(centers_pool: np.ndarray, assign: np.ndarray, jitter: float):
        z = rng.standard_normal((len(assign), d)).astype(np.float32)
        return centers_pool[assign] + jitter * (z @ W.T)

    # Zipf topic sizes
    sizes = 1.0 / np.arange(1, roots + 1) ** 1.1
    sizes /= sizes.sum()
    root_centers = (rng.standard_normal((roots, d)).astype(np.float32) @ W.T) * 6.0
    # subclusters: 8 per root, centers offset from the root
    subs_per = 8
    sub_centers = (
        root_centers[:, None, :]
        + 2.0 * (rng.standard_normal((roots, subs_per, d)).astype(np.float32) @ W.T)
    ).reshape(roots * subs_per, d)

    root_assign = rng.choice(roots, size=n, p=sizes)
    sub_assign = root_assign * subs_per + rng.integers(0, subs_per, size=n)
    train = sample(sub_centers, sub_assign, jitter=1.0)

    nq_in = int(n_queries * 0.9)
    q_root = rng.choice(roots, size=nq_in, p=sizes)
    q_sub = q_root * subs_per + rng.integers(0, subs_per, size=nq_in)
    q_in = sample(sub_centers, q_sub, jitter=1.0)
    # OOD probes: fresh topics never seen in train
    ood_centers = (rng.standard_normal((n_queries - nq_in, d)).astype(np.float32) @ W.T) * 6.0
    q_ood = ood_centers + rng.standard_normal((n_queries - nq_in, d)).astype(np.float32) @ W.T
    queries = np.concatenate([q_in, q_ood]).astype(np.float32)
    return Dataset(
        f"synthetic-hard-{n}x{d}", metric, train.astype(np.float32), queries, None, synthetic=True
    )


def clustered(n: int, d: int, n_queries: int = 1000, metric: str = "cosine", seed: int = 42) -> Dataset:
    """bench.py's isotropic gaussian mixture (kept for comparability)."""
    rng = np.random.default_rng(seed)
    n_clusters = max(32, n // 256)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    train = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    qa = rng.integers(0, n_clusters, size=n_queries)
    queries = (centers[qa] + rng.standard_normal((n_queries, d))).astype(np.float32)
    return Dataset(f"clustered-{n}x{d}", metric, train, queries, None, synthetic=True)


def resolve(spec: str) -> Dataset:
    """Parse a dataset spec string:

    * ``sift1m:/data/sift``          — TEXMEX dir with sift_base.fvecs …
    * ``texmex:euclidean:name:/dir`` — any TEXMEX corpus
    * ``hdf5:/path/glove-100-angular.hdf5`` — ann-benchmarks file
    * ``synthetic-hard:n=100000,d=768,metric=cosine``
    * ``clustered:n=100000,d=768,metric=cosine``
    """
    kind, _, rest = spec.partition(":")
    if kind == "sift1m":
        return load_texmex(rest, "sift", "euclidean")
    if kind == "texmex":
        metric, name, path = rest.split(":", 2)
        return load_texmex(path, name, metric)
    if kind == "hdf5":
        return load_ann_benchmarks(rest)
    if kind in ("synthetic-hard", "clustered"):
        kw: dict = {}
        for part in rest.split(","):
            if not part:
                continue
            k, v = part.split("=")
            kw[k] = v if k == "metric" else int(v)
        fn = synthetic_hard if kind == "synthetic-hard" else clustered
        return fn(**kw)
    raise ValueError(f"unknown dataset spec {spec!r}")
