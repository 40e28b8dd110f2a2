from .idset import IdSet
from .progress import BuildStep, CallbackProgress, InsertItemsStep, NoProgress
from .stats import BuildStats

__all__ = [
    "IdSet",
    "BuildStep",
    "CallbackProgress",
    "InsertItemsStep",
    "NoProgress",
    "BuildStats",
]
