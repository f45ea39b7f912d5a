"""Weight initializers statistically matching the PyTorch reference.

The epoch-1 loss-parity target (BASELINE.md) requires matching the reference's
init *distributions*:

* torch `nn.Linear` / `nn.Conv2d` default: kaiming-uniform(a=sqrt(5)) on the
  kernel and U(+-1/sqrt(fan_in)) on the bias — both reduce to
  U(+-1/sqrt(fan_in)).
* `kaiming_normal_(a=0.2)` for the MNIST residual generator convs
  (reference `mnist/models/generator.py:58-69`).
* N(0, 0.02) DCGAN init (`dconv_gan/mnist/mnist_dcgan.py:63-69`).
* N(0, 0.01) embeddings for label planes (`mnist/models/generator.py:69`).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

# torch default for Linear/Conv kernels: U(+-1/sqrt(fan_in)).
# variance_scaling uniform draws U(+-sqrt(3*scale/fan)), so scale=1/3.
torch_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def scaled_uniform(fan_in: int):
    """torch bias init: U(+-1/sqrt(fan_in)) — fan_in supplied by the caller
    because bias shape alone doesn't carry it."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal(negative_slope: float = 0.0):
    """torch kaiming_normal_(a=slope): N(0, gain^2/fan_in),
    gain = sqrt(2/(1+a^2))."""
    gain_sq = 2.0 / (1.0 + negative_slope**2)
    return variance_scaling(gain_sq, "fan_in", "normal")


def normal(stddev: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)

    return init


zeros = jax.nn.initializers.zeros
ones = jax.nn.initializers.ones
