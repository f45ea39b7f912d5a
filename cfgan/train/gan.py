"""Plain-generation GAN training steps (simple / conditional / DCGAN /
WGAN-GP), each compiled as one fused XLA program per batch.

Reference loops rebuilt here (semantics, not code):
* simple moons  — D then G, non-saturating log-loss on sigmoid probs
  (`simple_gan/moons/make_moons_gan.py:49-93`);
* simple MNIST  — G updated BEFORE D each batch, BCELoss
  (`simple_gan/mnist/mnist_gan.py:113-142`);
* conditional moons — class-conditional non-saturating
  (`conditional_gan/moons/make_moons_cgan.py:83-135`; the reference's
  D-step fake-labels-always-0 bug at :98 is fixed, not replicated —
  SURVEY.md section 2.11);
* DCGAN — D-real + D-fake then G through the updated D
  (`dconv_gan/mnist/mnist_dcgan.py:140-175`);
* WGAN-GP — critic every batch with gradient penalty, G every n_critic
  batches via `lax.cond` (`mnist_wgan_conditional.py:129-189`).

Like the CounteRGAN step, the generator runs forward exactly once per batch
(its linearization is saved with `jax.vjp` and reused for the G update), so
the generator's BatchNorm statistics advance once per batch exactly like the
eager reference.

Documented deviation (BN discriminators, `separate_d_passes=True`): the
reference's G phase scores the fake batch through the still-train-mode
discriminator, updating D's BN *running* stats a third time per batch; here
that side update is discarded (batch statistics — which drive the gradients —
are identical, so training dynamics match; only D's stored running averages
differ, mattering solely for eval-mode D reuse).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from cfgan.losses import gan as losses
from cfgan.train.state import GANState, NetState


def make_gan_step(
    *,
    g_apply: Callable,  # (params, stats, z, cond_oh, key) -> (fake, new_stats)
    d_apply: Callable,  # (params, stats, x, cond_oh, train) -> (out, new_stats)
    tx_g,
    tx_d,
    latent_dim: int,
    num_classes: int = 0,  # 0 => unconditional
    loss: str = "nonsaturating",  # nonsaturating | wgan_gp
    g_before_d: bool = False,
    n_critic: int = 1,
    gp_lambda: float = 10.0,
    eps: float = 0.0,  # log-clip for countergan2-style clipped losses
    separate_d_passes: bool = False,
):
    """Returns step(state, x, y, key) -> (state, metrics).

    `y` is ignored for unconditional families (pass zeros).  For WGAN-GP the
    generator update fires on batches where `state.step % n_critic == 0`,
    matching the reference's every-n_critic G schedule.
    """
    conditional = num_classes > 0
    wgan = loss == "wgan_gp"

    def sample_latent(key, b, x_dtype):
        return jax.random.normal(key, (b, latent_dim), x_dtype)

    def fake_cond(key, b):
        # random fake-batch labels over the FULL class range (bug at
        # make_moons_cgan.py:98 deliberately not reproduced)
        return jax.random.randint(key, (b,), 0, max(num_classes, 1))

    def step(state: GANState, x, y, key):
        b = x.shape[0]
        k_z, k_c, k_gp = jax.random.split(jax.random.fold_in(key, state.step), 3)
        z = sample_latent(k_z, b, x.dtype)
        if conditional:
            t = fake_cond(k_c, b)
            t_oh = jax.nn.one_hot(t, num_classes, dtype=x.dtype)
            y_oh = jax.nn.one_hot(y, num_classes, dtype=x.dtype)
        else:
            t_oh = y_oh = jnp.zeros((b, 0), x.dtype)

        # ---- generator forward once; linearization saved ----
        def g_fn(g_params):
            fake, new_stats = g_apply(g_params, state.g.stats, z, t_oh, k_z)
            return fake, new_stats

        fake, g_vjp, new_g_stats = jax.vjp(g_fn, state.g.params, has_aux=True)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            if separate_d_passes:
                # a BatchNorm discriminator MUST see real and fake in
                # separate passes (torch reference semantics,
                # `mnist_dcgan.py:150-164`): a concatenated batch lets BN's
                # batch statistics separate real from fake for free, which
                # collapses the generator
                real_out, d_stats1 = d_apply(d_params, state.d.stats, x,
                                             y_oh, True)
                fake_out, new_d_stats = d_apply(d_params, d_stats1, fake_sg,
                                                t_oh, True)
            else:
                xx = jnp.concatenate([x, fake_sg], axis=0)
                cc = jnp.concatenate([y_oh, t_oh], axis=0)
                out, new_d_stats = d_apply(d_params, state.d.stats, xx, cc,
                                           True)
                real_out, fake_out = jnp.split(out, 2, axis=0)
            if wgan:
                dl = losses.d_loss_wasserstein(real_out, fake_out)
                gp = losses.gradient_penalty(
                    lambda xh, ch: d_apply(d_params, state.d.stats, xh, ch,
                                           False)[0],
                    k_gp, x, fake_sg, t_oh,
                )
                dl = dl + gp_lambda * gp
            else:
                dl = losses.d_loss_nonsaturating(real_out, fake_out, eps)
            return dl, (new_d_stats, jnp.mean(real_out), jnp.mean(fake_out))

        def g_loss_and_update(d_net: NetState, g_stats):
            def g_terms(fake_in):
                # BN discriminators also score the generator batch with
                # train-mode (batch) statistics, like the eager reference;
                # the running-stat side update is discarded here
                out, _ = d_apply(d_net.params, d_net.stats, fake_in, t_oh,
                                 separate_d_passes)
                if wgan:
                    return losses.g_loss_wasserstein(out)
                return losses.g_loss_nonsaturating(out, eps)

            gl, ct = jax.value_and_grad(g_terms)(fake)
            (g_grads,) = g_vjp(ct)
            return state.g.apply_grads(tx_g, g_grads, new_stats=g_stats), gl

        if g_before_d:
            # simple_gan/mnist order: G first (through current D), then D
            g_new, g_loss = g_loss_and_update(state.d, new_g_stats)
            (d_loss, (new_d_stats, d_real, d_fake)), d_grads = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(state.d.params)
            )
            d_new = state.d.apply_grads(tx_d, d_grads, new_stats=new_d_stats)
        else:
            (d_loss, (new_d_stats, d_real, d_fake)), d_grads = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(state.d.params)
            )
            d_new = state.d.apply_grads(tx_d, d_grads, new_stats=new_d_stats)
            if n_critic > 1:
                g_new, g_loss = jax.lax.cond(
                    state.step % n_critic == 0,
                    lambda: g_loss_and_update(d_new, new_g_stats),
                    lambda: (state.g.replace(stats=new_g_stats),
                             jnp.zeros(())),
                )
            else:
                g_new, g_loss = g_loss_and_update(d_new, new_g_stats)

        metrics = {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "d_real": d_real,
            "d_fake": d_fake,
        }
        return GANState(g=g_new, d=d_new, step=state.step + 1), metrics

    return step
