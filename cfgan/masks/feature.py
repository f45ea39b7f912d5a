"""Tabular feature masks.

Training: per-feature Bernoulli(0.5) with immutable features forced to zero
(reference `house trainer.py:253-255`, `moons/trainer.py:69`).
Eval/serving: a fixed mask equal to the complement of the immutable (or
user-forbidden) set (`house eval_utils.py:49-51`, `gradio_app.py:150-156`).
All masks are dense operands (never shapes) so per-request masks don't
retrigger compilation.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def random_feature_mask(key, batch: int, dim: int, immutable_idx: Sequence[int] = ()):
    mask = jax.random.randint(key, (batch, dim), 0, 2).astype(jnp.float32)
    if len(immutable_idx):
        imm = jnp.zeros((dim,), jnp.float32).at[jnp.asarray(immutable_idx)].set(1.0)
        mask = mask * (1.0 - imm)
    return mask


def immutable_complement_mask(batch: int, dim: int, immutable_idx: Sequence[int] = ()):
    """All-ones mask except immutable features (deterministic eval mask)."""
    row = jnp.ones((dim,), jnp.float32)
    if len(immutable_idx):
        row = row.at[jnp.asarray(immutable_idx)].set(0.0)
    return jnp.broadcast_to(row, (batch, dim))


def feature_names_to_mask(allowed, batch: int, schema):
    """Per-request mask from a user's allowed-feature list: 1 for allowed
    mutable features, 0 elsewhere (`house gradio_app.py:150-156` builds the
    complement immutable set; here the mask is built directly)."""
    row = jnp.zeros((schema.input_dim,), jnp.float32)
    idx = [schema.feature_names.index(f) for f in allowed
           if f in schema.feature_names and f not in schema.immutable_features]
    if idx:
        row = row.at[jnp.asarray(idx)].set(1.0)
    return jnp.broadcast_to(row, (batch, schema.input_dim))
