"""Normalization as explicit, checkpointable metadata.

The reference fits a sklearn MinMaxScaler on the train split and stashes the
*live scaler object* into its config dict (`house data_utils.py:37-40`),
which eval and serving then rely on.  Here the stats are a plain pytree that
travels with checkpoints (cfgan.core.checkpoint metadata).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class NormStats(NamedTuple):
    """MinMax scaling stats (feature-wise): x_norm = (x - min) / (max - min)."""

    data_min: np.ndarray
    data_max: np.ndarray

    @property
    def data_range(self):
        return self.data_max - self.data_min

    def transform(self, x):
        return (x - self.data_min) / jnp.where(self.data_range == 0, 1.0, self.data_range)

    def inverse_transform(self, x):
        return x * self.data_range + self.data_min

    def normalize_values(self, feature_idx: int, raw_values):
        """Normalize raw categorical values of one feature to [0,1] scalars
        (the cat_norm_maps of `house trainer.py:206-224`)."""
        raw = np.asarray(raw_values, dtype=np.float64)
        rng = self.data_range[feature_idx]
        return ((raw - self.data_min[feature_idx]) / (rng + 1e-12)).astype(np.float32)

    def to_metadata(self) -> dict:
        return {
            "data_min": np.asarray(self.data_min).tolist(),
            "data_max": np.asarray(self.data_max).tolist(),
        }

    @classmethod
    def from_metadata(cls, meta: dict) -> "NormStats":
        return cls(
            np.asarray(meta["data_min"], np.float32),
            np.asarray(meta["data_max"], np.float32),
        )


def fit_minmax(x_train: np.ndarray) -> NormStats:
    return NormStats(
        x_train.min(axis=0).astype(np.float32),
        x_train.max(axis=0).astype(np.float32),
    )


def image_normalize(x_uint8_or_01, mean: float = 0.5, std: float = 0.5):
    """[0,1] (or uint8) images -> normalized, e.g. [-1,1] for GAN training
    (torchvision Normalize((.5),(.5)) in `mnist/data_utils.py:9-12`)."""
    x = jnp.asarray(x_uint8_or_01)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return (x - mean) / std


def image_denormalize(x, mean: float = 0.5, std: float = 0.5):
    return x * std + mean
