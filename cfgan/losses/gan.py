"""GAN loss zoo covering every formulation the reference uses.

* BCE-with-logits real/fake (MNIST CounteRGAN, `mnist/trainer.py:103-118`).
* Non-saturating log-loss on sigmoid probabilities (simple/conditional MLP
  GANs, `simple_gan/moons/make_moons_gan.py:69,82`).
* BCE on probabilities (DCGAN / simple MNIST GAN).
* Wasserstein mean-difference, with spectral norm (tabular/moons CounteRGAN,
  `house trainer.py:290-295`) or with gradient penalty (conditional WGAN-GP,
  `conditional_gan/mnist/mnist_wgan_conditional.py:146-152`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_logits(logits, targets):
    """Mean binary cross entropy on logits == torch BCEWithLogitsLoss."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def d_loss_bce(real_logits, fake_logits):
    return bce_logits(real_logits, jnp.ones_like(real_logits)) + bce_logits(
        fake_logits, jnp.zeros_like(fake_logits)
    )


def g_loss_bce(fake_logits):
    return bce_logits(fake_logits, jnp.ones_like(fake_logits))


@jax.custom_jvp
def _log_floored(p):
    """log with a floored argument AND a floored-denominator derivative:
    value = log(max(p, 1e-12)), d/dp = 1/max(p, 1e-12).  A plain
    `log(maximum(p, eps))` would zero the gradient once p < eps — a fully
    saturated discriminator would hand the generator a ZERO gradient (stall).
    torch BCELoss instead clamps the log at -100 and floors its backward's
    denominator, giving a large-but-finite push; this reproduces that."""
    return jnp.log(jnp.maximum(p, 1e-12))


@_log_floored.defjvp
def _log_floored_jvp(primals, tangents):
    (p,), (p_dot,) = primals, tangents
    return _log_floored(p), p_dot / jnp.maximum(p, 1e-12)


def _safe_log(p, eps: float):
    """Saturation-safe log: a sigmoid that saturates to exactly 0.0/1.0 in
    f32 gives a large-but-FINITE loss and a large-but-finite (never zero)
    gradient, matching torch BCELoss's clamped value + floored backward."""
    return _log_floored(p + eps)


def d_loss_nonsaturating(real_probs, fake_probs, eps: float = 0.0):
    """-mean(log D(x)) - mean(log(1 - D(G(z)))) on sigmoid outputs."""
    return -jnp.mean(_safe_log(real_probs, eps)) - jnp.mean(
        _safe_log(1.0 - fake_probs, eps)
    )


def g_loss_nonsaturating(fake_probs, eps: float = 0.0):
    return -jnp.mean(_safe_log(fake_probs, eps))


def d_loss_wasserstein(real_scores, fake_scores):
    """-E[D(real)] + E[D(fake)] (critic minimizes)."""
    return -jnp.mean(real_scores) + jnp.mean(fake_scores)


def g_loss_wasserstein(fake_scores):
    return -jnp.mean(fake_scores)


def gradient_penalty(critic_fn, key, real, fake, *cond):
    """WGAN-GP penalty lambda-free: mean((||grad_x D(x_hat)|| - 1)^2).

    `critic_fn(x, *cond) -> scores`; interpolation per sample as in
    `mnist_wgan_conditional.py:139-152` (double backward is just `jax.grad`
    composed under jit here).
    """
    b = real.shape[0]
    eps_shape = (b,) + (1,) * (real.ndim - 1)
    eps = jax.random.uniform(key, eps_shape, real.dtype)
    x_hat = eps * real + (1.0 - eps) * fake

    def _sum_scores(x):
        return jnp.sum(critic_fn(x, *cond))

    grads = jax.grad(_sum_scores)(x_hat)
    norms = jnp.sqrt(jnp.sum(grads**2, axis=tuple(range(1, real.ndim))) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)
