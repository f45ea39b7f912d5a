"""Loss-formula parity vs PyTorch (the reference's framework) on identical
inputs — the unit-level half of the epoch-1 loss-equivalence target."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from cfgan.losses import gan as gl
from cfgan.losses import countergan as cg


RNG = np.random.RandomState(0)


def test_bce_logits_matches_torch():
    logits = RNG.randn(64, 1).astype(np.float32)
    targets = (RNG.rand(64, 1) > 0.5).astype(np.float32)
    ours = float(gl.bce_logits(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = float(
        torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(targets))
    )
    assert abs(ours - theirs) < 1e-6


def test_d_and_g_bce_losses():
    real = RNG.randn(32, 1).astype(np.float32)
    fake = RNG.randn(32, 1).astype(np.float32)
    bce = torch.nn.BCEWithLogitsLoss()
    tr, tf = torch.tensor(real), torch.tensor(fake)
    expected_d = float(bce(tr, torch.ones_like(tr)) + bce(tf, torch.zeros_like(tf)))
    expected_g = float(bce(tf, torch.ones_like(tf)))
    assert abs(float(gl.d_loss_bce(jnp.asarray(real), jnp.asarray(fake))) - expected_d) < 1e-6
    assert abs(float(gl.g_loss_bce(jnp.asarray(fake))) - expected_g) < 1e-6


def test_wasserstein_losses():
    real = RNG.randn(32, 1).astype(np.float32)
    fake = RNG.randn(32, 1).astype(np.float32)
    assert abs(
        float(gl.d_loss_wasserstein(jnp.asarray(real), jnp.asarray(fake)))
        - (-real.mean() + fake.mean())
    ) < 1e-6
    assert abs(float(gl.g_loss_wasserstein(jnp.asarray(fake))) + fake.mean()) < 1e-6


def test_nonsaturating_matches_reference_formula():
    dr = RNG.rand(32, 1).astype(np.float32) * 0.98 + 0.01
    df = RNG.rand(32, 1).astype(np.float32) * 0.98 + 0.01
    expected = float(-(np.log(dr) + np.log(1 - df)).mean())
    got = float(gl.d_loss_nonsaturating(jnp.asarray(dr), jnp.asarray(df)))
    # reference: -mean(log D(x) + log(1-D(G(z)))) — one mean over the sum
    assert abs(got - (-np.log(dr).mean() - np.log(1 - df).mean())) < 1e-6
    assert abs(got - expected) < 1e-6


def test_gradient_penalty_matches_torch():
    """GP through a fixed linear critic, same interpolation eps."""
    W = RNG.randn(8, 1).astype(np.float32)
    real = RNG.randn(16, 8).astype(np.float32)
    fake = RNG.randn(16, 8).astype(np.float32)
    eps = RNG.rand(16, 1).astype(np.float32)

    # torch oracle
    tw = torch.tensor(W)
    tr, tf, te = torch.tensor(real), torch.tensor(fake), torch.tensor(eps)
    x_hat = (te * tr + (1 - te) * tf).requires_grad_(True)
    scores = x_hat @ tw
    grads = torch.autograd.grad(scores.sum(), x_hat, create_graph=True)[0]
    expected = float(((grads.norm(2, dim=1) - 1) ** 2).mean())

    def critic(x):
        return x @ jnp.asarray(W)

    x_hat_j = jnp.asarray(eps) * jnp.asarray(real) + (1 - jnp.asarray(eps)) * jnp.asarray(fake)
    g = jax.grad(lambda x: jnp.sum(critic(x)))(x_hat_j)
    norms = jnp.sqrt(jnp.sum(g**2, axis=1) + 1e-12)
    got = float(jnp.mean((norms - 1.0) ** 2))
    assert abs(got - expected) < 1e-5


def test_countergan_composite_terms():
    b, d, c = 16, 5, 4
    raw = RNG.randn(b, d).astype(np.float32)
    mask = (RNG.rand(b, d) > 0.5).astype(np.float32)
    masked = raw * mask
    logits = RNG.randn(b, c).astype(np.float32)
    target = RNG.randint(0, c, b)

    terms = cg.countergan_g_terms(
        jnp.asarray(0.5), jnp.asarray(logits), jnp.asarray(target),
        jnp.asarray(masked), jnp.asarray(raw), jnp.asarray(mask),
        lambda_adv=1.0, lambda_cls=2.0, lambda_reg_l1=1.0,
        lambda_reg_l2=0.5, lambda_mask=1.0,
    )
    ce = float(F.cross_entropy(torch.tensor(logits), torch.tensor(target)))
    l1 = float(torch.norm(torch.tensor(masked), p=1, dim=1).mean())
    l2 = float(torch.norm(torch.tensor(masked), p=2, dim=1).mean())
    pen = float(np.abs(raw * (1 - mask)).mean())
    assert abs(float(terms.cls) - ce) < 1e-5
    assert abs(float(terms.reg_l1) - l1) < 1e-4
    assert abs(float(terms.reg_l2) - l2) < 1e-4
    assert abs(float(terms.mask_penalty) - pen) < 1e-6
    expected_total = 0.5 + 2 * ce + l1 + 0.5 * l2 + pen
    assert abs(float(terms.total) - expected_total) < 1e-4


def test_mnist_reg_reduction_mean_abs():
    masked = RNG.randn(8, 28, 28, 1).astype(np.float32)
    got = float(cg.proximity_l1(jnp.asarray(masked), "mean_abs"))
    assert abs(got - np.abs(masked).mean()) < 1e-6


def test_nonsaturating_losses_survive_saturated_discriminator():
    """torch BCELoss clamps log at -100; a saturated sigmoid (exactly 0/1 in
    f32) must give a finite loss and finite gradients, not inf/NaN."""
    from cfgan.losses.gan import d_loss_nonsaturating, g_loss_nonsaturating

    real = jnp.asarray([1.0, 0.0, 0.5])
    fake = jnp.asarray([1.0, 0.0, 0.5])
    d = d_loss_nonsaturating(real, fake)
    g = g_loss_nonsaturating(jnp.asarray([0.0, 1.0]))
    assert np.isfinite(float(d)) and np.isfinite(float(g))

    grad = jax.grad(lambda p: g_loss_nonsaturating(jax.nn.sigmoid(p)))(
        jnp.asarray([-100.0, 0.0, 100.0])  # saturates sigmoid in f32
    )
    assert np.all(np.isfinite(np.asarray(grad)))


def test_saturated_discriminator_gradient_is_nonzero():
    """A fully saturated D (p == 0 exactly) must still push the generator:
    d/dp[-log p] is floored at -1e12 like torch BCELoss's backward, never
    zeroed (a zero gradient would stall G exactly when it needs rescuing)."""
    from cfgan.losses.gan import g_loss_nonsaturating

    g = jax.grad(lambda p: g_loss_nonsaturating(p))(jnp.asarray([0.0]))
    assert np.isfinite(float(g[0]))
    assert float(g[0]) <= -1e11  # large finite push, not 0

    # well away from saturation the gradient is the exact -1/p
    g2 = jax.grad(lambda p: g_loss_nonsaturating(p))(jnp.asarray([0.25]))
    np.testing.assert_allclose(float(g2[0]), -4.0, rtol=1e-6)
