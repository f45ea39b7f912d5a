"""Gumbel-Softmax with straight-through ("hard") estimator.

Equivalent to `F.gumbel_softmax(logits, tau, hard, dim=-1)` used by the
tabular generator's categorical heads
(reference `house models/generator.py:86-90`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(key, logits, tau: float = 1.0, hard: bool = False,
                   axis: int = -1, noise=None):
    """`noise` (same shape as logits) overrides the internal Gumbel draw —
    used by the torch-parity harness to feed BOTH frameworks identical
    samples; `key` may be None in that case."""
    g = jax.random.gumbel(key, logits.shape, logits.dtype) if noise is None \
        else noise
    y = jax.nn.softmax((logits + g) / tau, axis=axis)
    if hard:
        idx = jnp.argmax(y, axis=axis)
        y_hard = jax.nn.one_hot(idx, logits.shape[axis], dtype=logits.dtype, axis=axis)
        # straight-through: forward = hard one-hot, backward = soft
        y = y_hard + y - jax.lax.stop_gradient(y)
    return y
