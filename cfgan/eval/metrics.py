"""Counterfactual quality metrics, compiled and vmapped over target classes.

Reference formulas:
* MNIST `evaluate_counterfactuals` (`mnist/eval_utils.py:46-76`): all-ones
  mask, clamp [-1,1]; flip = pred(x_cf)==target;
  prediction_gain = p_cf[target] - p_cf[y_true] (both on x_cf);
  actionability = mean|x_cf - x|.
* MNIST per-target sweep (`mnist/eval_utils.py:78-110`): every target class
  over the whole test set (no same-class exclusion).
* tabular/moons `compute_metrics_per_target` (`house eval_utils.py:185-289`,
  `moons/eval_utils.py:29-106`): samples with y == target are excluded;
  prediction_gain = p_cf[target] - p_orig[target];
  actionability = mean|masked_residual|.
* masked metrics (`mnist/eval_utils.py:292-344`): FR_mean/FR_max, allowed-L1
  (inside mask), forbidden penalty (outside mask).

The per-target Python loop of the reference becomes one `vmap` over the
target axis inside a single jit; batches stream on the host with weighted
sums accumulated on device (global weighted mean rather than the reference's
mean-of-batch-means — identical up to ragged-final-batch rounding).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


def _per_sample_mean_abs(a):
    return jnp.mean(jnp.abs(a.reshape(a.shape[0], -1)), axis=1)


def make_per_target_sweep(
    cf_fn: Callable,
    clf_fn: Callable,
    num_classes: int,
    *,
    exclude_same_class: bool,
    pred_gain_mode: str,  # "cf_target_minus_orig_target" | "cf_target_minus_cf_true"
    actionability_mode: str,  # "masked_residual" | "x_cf_minus_x"
):
    """Returns sweep(g_vars, x, y, mask, key) -> dict of (num_classes, 3)
    accumulated sums; use `per_target_metrics` for the user-facing API."""

    def one_target(g_vars, x, y, mask, key, target):
        b = x.shape[0]
        tvec = jnp.full((b,), target, jnp.int32)
        x_cf, raw, masked = cf_fn(g_vars, x, tvec, mask, key)
        logits_cf = clf_fn(x_cf)
        probs_cf = jax.nn.softmax(logits_cf, axis=1)
        preds_cf = jnp.argmax(logits_cf, axis=1)

        w = jnp.where(y != target, 1.0, 0.0) if exclude_same_class else jnp.ones((b,))
        flip = (preds_cf == tvec).astype(jnp.float32)
        p_cf_t = probs_cf[jnp.arange(b), tvec]
        if pred_gain_mode == "cf_target_minus_cf_true":
            gain = p_cf_t - probs_cf[jnp.arange(b), y]
        else:
            probs_orig = jax.nn.softmax(clf_fn(x), axis=1)
            gain = p_cf_t - probs_orig[jnp.arange(b), tvec]
        if actionability_mode == "masked_residual":
            act = _per_sample_mean_abs(masked)
        else:
            act = _per_sample_mean_abs(x_cf - x)
        return jnp.stack(
            [jnp.sum(w * flip), jnp.sum(w * gain), jnp.sum(w * act), jnp.sum(w)]
        )

    @jax.jit
    def sweep(g_vars, x, y, mask, key):
        targets = jnp.arange(num_classes)
        return jax.vmap(lambda t: one_target(g_vars, x, y, mask, key, t))(targets)

    return sweep


def per_target_metrics(
    sweep,
    g_vars,
    x,
    y,
    mask_fn: Callable[[int], jnp.ndarray],
    key,
    num_classes: int,
    batch_size: int = 2048,
) -> pd.DataFrame:
    """Stream the dataset through the compiled sweep; returns the per-target
    DataFrame matching `countergan_metrics_per_class.csv` /
    `countergan_metrics.csv` column semantics."""
    x = np.asarray(x)
    y = np.asarray(y)
    acc = np.zeros((num_classes, 4))
    for lo in range(0, len(y), batch_size):
        xb = jnp.asarray(x[lo : lo + batch_size])
        yb = jnp.asarray(y[lo : lo + batch_size])
        acc += np.asarray(sweep(g_vars, xb, yb, mask_fn(len(yb)), key))
    denom = np.where(acc[:, 3] == 0, np.nan, acc[:, 3])
    return pd.DataFrame(
        {
            "target_class": np.arange(num_classes),
            "class_flip_rate": acc[:, 0] / denom,
            "prediction_gain": acc[:, 1] / denom,
            "avg_actionability": acc[:, 2] / denom,
        }
    )


def evaluate_counterfactual_batch(
    cf_fn, clf_fn, g_vars, x, y_true, y_target, mask, key=None
):
    """Single-batch metrics (the MNIST `evaluate_counterfactuals` contract).
    Returns (metrics dict, x_cf)."""
    x = jnp.asarray(x)
    x_cf, raw, masked = cf_fn(g_vars, x, y_target, mask, key)
    logits = clf_fn(x_cf)
    probs = jax.nn.softmax(logits, axis=1)
    b = x.shape[0]
    preds = jnp.argmax(logits, axis=1)
    metrics = {
        "class_flip_rate": float(jnp.mean((preds == y_target).astype(jnp.float32))),
        "prediction_gain": float(
            jnp.mean(probs[jnp.arange(b), y_target] - probs[jnp.arange(b), y_true])
        ),
        "actionability": float(jnp.mean(jnp.abs(x_cf - x))),
    }
    return metrics, x_cf


def masked_metrics(clf_fn, x, x_cf, raw, masked, mask, y_true, y_target):
    """FR_mean/FR_max + allowed-L1 + forbidden penalty
    (`mnist/eval_utils.py:292-344`)."""
    logits_cf = clf_fn(x_cf)
    preds_cf = jnp.argmax(logits_cf, axis=1)
    probs_cf = jax.nn.softmax(logits_cf, axis=1)
    probs_orig = jax.nn.softmax(clf_fn(x), axis=1)
    b = x.shape[0]
    flips = (preds_cf == y_target).astype(jnp.float32)
    return {
        "Class_flip_rate_mean": float(jnp.mean(flips)),
        "Class_flip_rate_max": float(jnp.max(flips)),
        "Residual_L1_norm_in_allowed_patches": float(
            jnp.mean(_per_sample_mean_abs(raw * mask))
        ),
        "Prediction_gain": float(
            jnp.mean(
                probs_cf[jnp.arange(b), y_target] - probs_orig[jnp.arange(b), y_true]
            )
        ),
        "Actionability (overall L1 norm)": float(jnp.mean(jnp.abs(x_cf - x))),
        "mask_penalty_pre": float(jnp.mean(_per_sample_mean_abs(raw * (1.0 - mask)))),
    }
