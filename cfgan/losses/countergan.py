"""The 4-term CounteRGAN generator objective.

    L_G = lambda_adv * adv
        + lambda_cls * CE(classifier(x_cf), target)
        + lambda_reg_l1 * prox_l1(masked_residual)
        + lambda_reg_l2 * prox_l2(masked_residual)        (moons only)
        + lambda_mask * mean|raw_residual * (1 - mask)|

Reference formulations: `mnist/trainer.py:114-123` (mean-abs L1, BCE adv),
`house trainer.py:297-312` (per-sample 1-norm then mean, Wasserstein adv),
`moons/trainer.py:91-98` (both L1 and L2 per-sample norms).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import optax


class CounterGANTerms(NamedTuple):
    adv: jnp.ndarray
    cls: jnp.ndarray
    reg_l1: jnp.ndarray
    reg_l2: jnp.ndarray
    mask_penalty: jnp.ndarray
    total: jnp.ndarray


def mask_penalty(raw_residual, mask):
    """mean |raw_residual outside the modifiable region|."""
    return jnp.mean(jnp.abs(raw_residual * (1.0 - mask)))


def proximity_l1(masked_residual, reduction: str = "per_sample_norm"):
    if reduction == "mean_abs":  # mnist: torch.abs(masked_residual).mean()
        return jnp.mean(jnp.abs(masked_residual))
    flat = masked_residual.reshape(masked_residual.shape[0], -1)
    return jnp.mean(jnp.sum(jnp.abs(flat), axis=1))


def proximity_l2(masked_residual):
    flat = masked_residual.reshape(masked_residual.shape[0], -1)
    return jnp.mean(jnp.sqrt(jnp.sum(flat**2, axis=1) + 1e-24))


def classifier_ce(logits, target):
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, target)
    )


def countergan_g_terms(
    adv_loss,
    clf_logits,
    target,
    masked_residual,
    raw_residual,
    mask,
    *,
    lambda_adv: float = 1.0,
    lambda_cls: float = 2.0,
    lambda_reg_l1: float = 1.0,
    lambda_reg_l2: float = 0.0,
    lambda_mask: float = 1.0,
    reg_reduction: str = "per_sample_norm",
) -> CounterGANTerms:
    cls = classifier_ce(clf_logits, target)
    l1 = proximity_l1(masked_residual, reg_reduction)
    l2 = proximity_l2(masked_residual) if lambda_reg_l2 else jnp.zeros(())
    pen = mask_penalty(raw_residual, mask)
    total = (
        lambda_adv * adv_loss
        + lambda_cls * cls
        + lambda_reg_l1 * l1
        + lambda_reg_l2 * l2
        + lambda_mask * pen
    )
    return CounterGANTerms(adv_loss, cls, l1, l2, pen, total)
