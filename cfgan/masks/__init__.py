from cfgan.masks.feature import random_feature_mask, immutable_complement_mask
from cfgan.masks.patch import (
    patch_grid_dims,
    random_patch_mask,
    patch_indices_to_mask,
    upsample_patch_mask,
)

__all__ = [
    "random_feature_mask",
    "immutable_complement_mask",
    "patch_grid_dims",
    "random_patch_mask",
    "patch_indices_to_mask",
    "upsample_patch_mask",
]
