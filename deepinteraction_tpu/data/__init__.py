from .pipeline import (
    build_sample,
    collate,
    load_points,
    load_sweep_points,
)
from .dataset import NuScenesDataset, cbgs_indices
from .loader import DataLoader

__all__ = [
    "build_sample",
    "collate",
    "load_points",
    "load_sweep_points",
    "NuScenesDataset",
    "cbgs_indices",
    "DataLoader",
]
