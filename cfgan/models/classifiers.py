"""Frozen-classifier architectures (CounteRGAN stage 1).

In JAX "freezing" is free: the classifier's params are simply closed over by
the generator loss — no requires_grad bookkeeping
(reference freezes via `mnist/main.py:32-33`).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cfgan.nn.layers import BatchNorm, Conv, Linear, leaky_relu, max_pool2d


class MLPClassifier(nn.Module):
    """moons: 2 -> 32 -> 32 -> 3 with ReLU (`moons/models/nn_classifier.py:3-15`)."""

    num_classes: int = 3
    hidden_dim: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jax.nn.relu(Linear(self.hidden_dim)(x))
        h = jax.nn.relu(Linear(self.hidden_dim)(h))
        return Linear(self.num_classes)(h)


class TabularClassifier(nn.Module):
    """house: 17 -> 256 -> 256 -> 128 -> 64 -> 4 with LeakyReLU(.1), BN and
    dropout (.3/.2/.1) (`house models/nn_classifier.py:4-32`).

    Torch layer order is Linear -> LeakyReLU -> BatchNorm -> Dropout."""

    num_classes: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        for width, drop in ((256, 0.3), (256, 0.2), (128, 0.1), (64, None)):
            x = Linear(width)(x)
            x = leaky_relu(x, 0.1)
            x = BatchNorm()(x, use_running_average=not train)
            if drop is not None:
                x = nn.Dropout(drop, deterministic=not train)(x)
        return Linear(self.num_classes)(x)


class CNNClassifier(nn.Module):
    """mnist: Conv(1->32 s1) / Conv(32->64 s2) / Conv(64->128 s2) + ReLU +
    Dropout2d(.25), FC 128*7*7 -> 256 -> 10 with Dropout(.5)
    (`mnist/models/classifier.py:4-28`).  Input NHWC."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jax.nn.relu(Conv(32, 3, 1, 1)(x))
        h = jax.nn.relu(Conv(64, 3, 2, 1)(h))
        h = jax.nn.relu(Conv(128, 3, 2, 1)(h))
        # Dropout2d drops whole channels: broadcast over spatial dims
        h = nn.Dropout(0.25, deterministic=not train, broadcast_dims=(1, 2))(h)
        h = h.reshape(h.shape[0], -1)
        h = jax.nn.relu(Linear(256)(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return Linear(self.num_classes)(h)


class LegacyCNNClassifier(nn.Module):
    """Legacy MaxPool CNN (`mnist/modules/classifier.py:4-30`, also
    `countergan2.py:97-110`): Conv(1->32,p1)+ReLU+MaxPool2 ->
    Conv(32->64,p1)+ReLU+MaxPool2 -> FC 64*7*7 -> 128 -> 10.  No dropout;
    `train` is accepted for interface parity with CNNClassifier.  Flatten is
    NHWC order (torch mirrors in tests permute before flattening)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = max_pool2d(jax.nn.relu(Conv(32, 3, 1, 1)(x)))
        h = max_pool2d(jax.nn.relu(Conv(64, 3, 1, 1)(h)))
        h = h.reshape(h.shape[0], -1)
        h = jax.nn.relu(Linear(128)(h))
        return Linear(self.num_classes)(h)
