"""Tabular residual assembly: continuous scatter + categorical one-hot ->
normalized-scalar conversion.

Reference `house trainer.py:263-283` (training, soft Gumbel) and
`house eval_utils.py:57-68,130-180` (eval, hard Gumbel): the generator emits
additive residuals for continuous features and a one-hot(-ish) sample per
categorical feature; each categorical sample is converted to its
MinMax-normalized scalar value and the residual becomes `scalar - x[:, f]`
so that `x + residual` lands exactly on a legal category value.
"""
from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cfgan.data.transforms import NormStats


def derive_gumbel_noise(
    key, batch: int, categorical_info: Mapping[int, Sequence[float]],
    dtype=jnp.float32,
) -> dict[int, jnp.ndarray]:
    """Deterministic per-head Gumbel noise: feature idx -> (B, n_values).

    Row i of head idx is `gumbel(fold_in(fold_in(key, idx), i))` — i.i.d.
    Gumbel exactly like drawing through flax's 'gumbel' rng collection, but
    with two engineered properties:

    * the torch parity oracle (`cfgan/testing/oracles.py`) can reproduce
      the SAME noise from the same step key, which is what makes
      epoch-scale tabular loss parity testable (the Gumbel draw is the one
      per-step nondeterminism the two frameworks cannot otherwise share;
      see `tests/test_step_parity_tabular.py`);
    * row i's noise depends only on (key, idx, i), NEVER on `batch` — so
      the serving engine's bucket padding (`serve/engine.py`) cannot
      change the counterfactual drawn for a given sample: padded and
      unpadded requests produce identical results for the real rows.
    """
    rows = jnp.arange(batch, dtype=jnp.uint32)
    out = {}
    for idx, vals in sorted(categorical_info.items()):
        head_key = jax.random.fold_in(key, idx)
        row_keys = jax.vmap(jax.random.fold_in, (None, 0))(head_key, rows)
        n_vals = len(vals)
        out[idx] = jax.vmap(
            lambda k: jax.random.gumbel(k, (n_vals,), dtype)  # noqa: B023
        )(row_keys)
    return out


def build_cat_norm_values(
    categorical_info: Mapping[int, Sequence[float]], stats: NormStats | None
) -> dict[int, np.ndarray]:
    """feature idx -> normalized scalar per category (cat_norm_maps)."""
    out = {}
    for fidx, raw_vals in categorical_info.items():
        if stats is not None:
            out[fidx] = stats.normalize_values(fidx, raw_vals)
        else:
            n = len(raw_vals)
            out[fidx] = (np.arange(n, dtype=np.float32) / max(1.0, n - 1))
    return out


def assemble_residual(
    x,
    cont_residual,
    cat_samples: Mapping[int, jnp.ndarray],
    continuous_idx: Sequence[int],
    cat_norm_values: Mapping[int, np.ndarray],
):
    """Returns the full (B, D) residual in normalized feature space."""
    residual = jnp.zeros_like(x)
    cont_idx = jnp.asarray(tuple(continuous_idx), jnp.int32)
    residual = residual.at[:, cont_idx].set(cont_residual.astype(x.dtype))
    for fidx in sorted(cat_samples):
        # norm values in x's dtype so the scatter stays dtype-homogeneous
        # under bf16 mixed precision (f32->bf16 scatter is a future error)
        norm_vals = jnp.asarray(cat_norm_values[fidx], x.dtype)
        scalar = cat_samples[fidx].astype(x.dtype) @ norm_vals  # (B,)
        residual = residual.at[:, fidx].set(scalar - x[:, fidx])
    return residual
