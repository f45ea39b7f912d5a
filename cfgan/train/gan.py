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

For the non-saturating families the generator runs forward exactly once per
batch (its linearization is saved with `jax.vjp` and reused for the G
update), so the generator's BatchNorm statistics advance once per batch
exactly like the eager reference.

WGAN-GP follows the reference's distinct data flow instead
(`mnist_wgan_conditional.py:137-168`): the critic phase draws a fresh z and
generates its fake batch conditioned on the REAL class labels (no grad to G),
and the gradient-penalty interpolates are conditioned on those same real
labels; the G phase (every n_critic batches) draws another fresh z with
RANDOM labels and runs its own generator forward.  The generator's BatchNorm
running stats therefore advance once per batch plus once more on G-update
batches, matching the eager reference's two train-mode forwards.

Documented deviations (training dynamics unchanged; listed so parity claims
stay auditable):

* BN discriminators (`separate_d_passes=True`): the reference's G phase
  scores the fake batch through the still-train-mode discriminator, updating
  D's BN *running* stats a third time per batch; here that side update is
  discarded (batch statistics — which drive the gradients — are identical,
  so training dynamics match; only D's stored running averages differ,
  mattering solely for eval-mode D reuse).
* Non-saturating families reuse the D-phase fake for the G update via the
  saved vjp, whereas the moons reference draws a FRESH z for the G step
  (`make_moons_gan.py:78`).  Both z draws come from the same distribution
  within the same batch; the saving is one generator forward per step.
* `d_loss_nonsaturating` SUMS the real and fake terms; the simple-MNIST
  reference averages them (`(real+fake)/2`, `mnist_gan.py:132`).  Adam's
  per-parameter normalization makes the 2x gradient scale nearly moot, but
  logged `d_loss` is 2x the reference's convention.
* The WGAN-GP G-update schedule counts GLOBAL steps (`state.step %
  n_critic`), while the reference counts per-epoch batch indices
  (`batch_idx % n_critic`, `mnist_wgan_conditional.py:157`); they coincide
  whenever steps_per_epoch is a multiple of n_critic and otherwise differ
  only in phase.
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
        k_z, k_c, k_gp, k_z2 = jax.random.split(
            jax.random.fold_in(key, state.step), 4
        )
        z = sample_latent(k_z, b, x.dtype)
        if conditional:
            t = fake_cond(k_c, b)
            t_oh = jax.nn.one_hot(t, num_classes, dtype=x.dtype)
            y_oh = jax.nn.one_hot(y, num_classes, dtype=x.dtype)
        else:
            t_oh = y_oh = jnp.zeros((b, 0), x.dtype)

        # ---- generator forward for the D/critic phase ----
        if wgan:
            # reference critic phase (`mnist_wgan_conditional.py:141-143`):
            # fresh z, fakes conditioned on the REAL class labels, generated
            # under no_grad (no linearization needed — the G update below
            # runs its own forward with fresh z + random labels)
            fake, new_g_stats = g_apply(state.g.params, state.g.stats, z,
                                        y_oh, k_z)
            fake_sg = jax.lax.stop_gradient(fake)
            g_vjp = None
            d_fake_cond = y_oh
        else:
            # linearization saved; reused for the G update
            def g_fn(g_params):
                fake, new_stats = g_apply(g_params, state.g.stats, z, t_oh,
                                          k_z)
                return fake, new_stats

            fake, g_vjp, new_g_stats = jax.vjp(g_fn, state.g.params,
                                               has_aux=True)
            fake_sg = jax.lax.stop_gradient(fake)
            d_fake_cond = t_oh

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
                                                d_fake_cond, True)
            else:
                xx = jnp.concatenate([x, fake_sg], axis=0)
                cc = jnp.concatenate([y_oh, d_fake_cond], axis=0)
                out, new_d_stats = d_apply(d_params, state.d.stats, xx, cc,
                                           True)
                real_out, fake_out = jnp.split(out, 2, axis=0)
            if wgan:
                dl = losses.d_loss_wasserstein(real_out, fake_out)
                # GP interpolates conditioned on the real labels, like the
                # critic-phase fakes (`mnist_wgan_conditional.py:146-148`)
                gp = losses.gradient_penalty(
                    lambda xh, ch: d_apply(d_params, state.d.stats, xh, ch,
                                           False)[0],
                    k_gp, x, fake_sg, d_fake_cond,
                )
                dl = dl + gp_lambda * gp
            else:
                dl = losses.d_loss_nonsaturating(real_out, fake_out, eps)
            return dl, (new_d_stats, jnp.mean(real_out), jnp.mean(fake_out))

        def g_loss_and_update(d_net: NetState, g_stats):
            if wgan:
                # reference G phase (`mnist_wgan_conditional.py:157-165`):
                # fresh z, RANDOM labels, its own train-mode G forward (so
                # BN running stats advance a second time on G batches)
                z2 = sample_latent(k_z2, b, x.dtype)

                def g_terms(g_params):
                    fake2, g_stats2 = g_apply(g_params, g_stats, z2, t_oh,
                                              k_z2)
                    out, _ = d_apply(d_net.params, d_net.stats, fake2, t_oh,
                                     False)
                    return losses.g_loss_wasserstein(out), g_stats2

                (gl, g_stats2), g_grads = jax.value_and_grad(
                    g_terms, has_aux=True
                )(state.g.params)
                return (state.g.apply_grads(tx_g, g_grads,
                                            new_stats=g_stats2), gl)

            def g_terms(fake_in):
                # BN discriminators also score the generator batch with
                # train-mode (batch) statistics, like the eager reference;
                # the running-stat side update is discarded here
                out, _ = d_apply(d_net.params, d_net.stats, fake_in, t_oh,
                                 separate_d_passes)
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
