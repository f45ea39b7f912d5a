"""make_moons + synthetic rectangle third class (2-D pedagogical dataset).

Behavioral equivalent of `moons/data_utils.py:7-22`: 800 two-moons points
(noise 0.1), 400 uniform points in [-2,2]x[2,4] labeled class 2, MinMax
scaled over the full set, 80/20 split.
"""
from __future__ import annotations

import numpy as np
from sklearn.datasets import make_moons
from sklearn.model_selection import train_test_split

from cfgan.data.transforms import NormStats, fit_minmax


def load_moons3(
    seed: int = 42,
    n_moons: int = 800,
    n_rect: int = 400,
    noise: float = 0.1,
    test_fraction: float = 0.2,
):
    rng = np.random.RandomState(seed)
    x_moons, y_moons = make_moons(n_samples=n_moons, noise=noise, random_state=rng)
    x_rect = rng.uniform(low=[-2, 2], high=[2, 4], size=(n_rect, 2))
    y_rect = np.full(n_rect, 2)

    x = np.vstack([x_moons, x_rect]).astype(np.float32)
    y = np.concatenate([y_moons, y_rect]).astype(np.int32)

    stats = fit_minmax(x)  # reference fits the scaler on ALL data here
    x = np.asarray(stats.transform(x), np.float32)

    x_train, x_test, y_train, y_test = train_test_split(
        x, y, test_size=test_fraction, random_state=seed
    )
    return (x_train, y_train), (x_test, y_test), stats


def load_moons2(seed: int = 42, n_samples: int = 2000, noise: float = 0.05):
    """Plain 2-class make_moons for the simple/conditional MLP GANs
    (`simple_gan/moons/make_moons_gan.py:23`,
    `conditional_gan/moons/make_moons_cgan.py:66`)."""
    x, y = make_moons(n_samples=n_samples, noise=noise, random_state=seed)
    return x.astype(np.float32), y.astype(np.int32)
