from . import codecs, distances
from .distances import (
    ALL_METRICS,
    BQ_COSINE,
    BQ_EUCLIDEAN,
    BQ_MANHATTAN,
    COSINE,
    EUCLIDEAN,
    HAMMING,
    MANHATTAN,
    Metric,
    by_name,
)

__all__ = [
    "codecs",
    "distances",
    "ALL_METRICS",
    "BQ_COSINE",
    "BQ_EUCLIDEAN",
    "BQ_MANHATTAN",
    "COSINE",
    "EUCLIDEAN",
    "HAMMING",
    "MANHATTAN",
    "Metric",
    "by_name",
]
