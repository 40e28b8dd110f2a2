from .idset import IdSet
from .progress import BuildStep, CallbackProgress, InsertItemsStep, NoProgress
from .stats import BuildStats
from .tracing import span

__all__ = [
    "IdSet",
    "BuildStep",
    "CallbackProgress",
    "InsertItemsStep",
    "NoProgress",
    "BuildStats",
    "span",
]
