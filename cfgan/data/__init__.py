from cfgan.data.transforms import (
    NormStats,
    fit_minmax,
    image_denormalize,
    image_normalize,
)
from cfgan.data.registry import load_dataset

__all__ = [
    "NormStats",
    "fit_minmax",
    "image_denormalize",
    "image_normalize",
    "load_dataset",
]
