"""Builders wiring the five plain-generation families into compiled steps.

Each returns a `GANBundle`: initialized state, the fused per-batch step, the
scanned epoch runner, and a jitted sampling function for progress grids.
Hyperparameters come from `GANConfig` (see `cfgan.experiments.presets` for
the per-reference values).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from cfgan.core.config import GANConfig
from cfgan.models.discriminators import (
    ConditionalMLPDiscriminator,
    DCGANDiscriminator,
    MLPDiscriminator,
    WGANCritic,
)
from cfgan.models.generators import (
    ConditionalMLPGenerator,
    DCGANGenerator,
    MLPGenerator,
    MLPImageGenerator,
    WGANGenerator,
)
from cfgan.train.countergan import make_epoch_runner
from cfgan.train.gan import make_gan_step
from cfgan.train.state import GANState, NetState, adam_like_torch


@dataclass
class GANBundle:
    g_model: Any
    d_model: Any
    state: GANState
    step_fn: Callable
    epoch_fn: Callable
    sample_fn: Callable  # (g_vars, z, cond_onehot_or_None) -> samples
    latent_dim: int
    num_classes: int  # 0 => unconditional


def _mk_state(g_model, d_model, g_inputs, d_inputs, tx_g, tx_d, seed):
    kg, kd = jax.random.split(jax.random.key(seed))
    g_vars = g_model.init(kg, *g_inputs, train=False) if _has_train(
        g_model
    ) else g_model.init(kg, *g_inputs)
    d_vars = d_model.init(kd, *d_inputs, train=False) if _has_train(
        d_model
    ) else d_model.init(kd, *d_inputs)
    return GANState(
        g=NetState.create(g_vars, tx_g),
        d=NetState.create(d_vars, tx_d),
        step=jnp.zeros((), jnp.int32),
    )


def _has_train(model) -> bool:
    import inspect

    return "train" in inspect.signature(model.__call__).parameters


def _stateful_apply(model, conditional: bool, trainable_stats: bool):
    """Returns apply(params, stats, x, cond_oh, train_or_key) for G and D."""
    takes_train = _has_train(model)

    def apply_g(params, stats, z, cond_oh, key):
        args = (z, cond_oh) if conditional else (z,)
        kwargs = {"train": True} if takes_train else {}
        if trainable_stats:
            out, new_stats = model.apply(
                {"params": params, **stats}, *args, mutable=["batch_stats"],
                **kwargs,
            )
            return out, new_stats
        return model.apply({"params": params, **stats}, *args, **kwargs), stats

    def apply_d(params, stats, x, cond_oh, train):
        args = (x, cond_oh) if conditional else (x,)
        kwargs = {"train": train} if takes_train else {}
        if trainable_stats and train:
            out, new_stats = model.apply(
                {"params": params, **stats}, *args, mutable=["batch_stats"],
                **kwargs,
            )
            return out, new_stats
        if takes_train:
            kwargs["train"] = False
        return model.apply({"params": params, **stats}, *args, **kwargs), stats

    return apply_g, apply_d


def build_gan(cfg: GANConfig, *, num_classes: int = 0,
              data_shape=None, seed: int = 42) -> GANBundle:
    """Construct the family named by `cfg.family`."""
    ld = cfg.latent_dim
    z0 = jnp.zeros((2, ld))

    if cfg.family == "simple_mlp":
        g_model = MLPGenerator(out_dim=2, hidden_dim=cfg.hidden_dim)
        d_model = MLPDiscriminator(hidden_dims=(cfg.hidden_dim,))
        g_in, d_in = (z0,), (jnp.zeros((2, 2)),)
        conditional, loss, g_stats, d_stats = False, "nonsaturating", False, False
    elif cfg.family == "mlp_image":
        g_model = MLPImageGenerator()
        d_model = MLPDiscriminator(hidden_dims=(512, 256), negative_slope=0.2,
                                   flatten=True)
        g_in, d_in = (z0,), (jnp.zeros((2, 28, 28, 1)),)
        conditional, loss, g_stats, d_stats = False, "nonsaturating", True, False
    elif cfg.family == "cgan_mlp":
        g_model = ConditionalMLPGenerator(out_dim=2, hidden_dim=cfg.hidden_dim)
        d_model = ConditionalMLPDiscriminator(hidden_dim=cfg.hidden_dim)
        oh0 = jnp.zeros((2, num_classes))
        g_in, d_in = (z0, oh0), (jnp.zeros((2, 2)), oh0)
        conditional, loss, g_stats, d_stats = True, "nonsaturating", False, False
    elif cfg.family == "dcgan":
        g_model = DCGANGenerator(g_hidden=cfg.hidden_dim)
        d_model = DCGANDiscriminator(d_hidden=cfg.hidden_dim)
        g_in, d_in = (z0,), (jnp.zeros((2, 64, 64, 1)),)
        conditional, loss, g_stats, d_stats = False, "nonsaturating", True, True
    elif cfg.family == "wgan_gp":
        g_model = WGANGenerator(generator_size=cfg.hidden_dim,
                                num_classes=num_classes)
        d_model = WGANCritic(critic_size=cfg.hidden_dim,
                             hidden_size=cfg.hidden_dim,
                             num_classes=num_classes)
        oh0 = jnp.zeros((2, num_classes))
        g_in, d_in = (z0, oh0), (jnp.zeros((2, 28, 28, 1)), oh0)
        conditional, loss, g_stats, d_stats = True, "wgan_gp", True, False
    else:
        raise ValueError(f"unknown GAN family {cfg.family!r}")

    # reference optimizers: Adam everywhere except WGAN-GP's AdamW
    # (`mnist_wgan_conditional.py:118-119`, torch AdamW default wd=0.01)
    wd = 0.01 if cfg.family == "wgan_gp" else 0.0
    tx_g = adam_like_torch(cfg.lr_g, betas=(cfg.beta1, cfg.beta2),
                           weight_decay=wd)
    tx_d = adam_like_torch(cfg.lr_d, betas=(cfg.beta1, cfg.beta2),
                           weight_decay=wd)
    state = _mk_state(g_model, d_model, g_in, d_in, tx_g, tx_d, seed)

    g_apply, _ = _stateful_apply(g_model, conditional, g_stats)
    _, d_apply = _stateful_apply(d_model, conditional, d_stats)
    # bf16 forward+backward on the MXU, f32 params/opt/losses — the same
    # mixed-precision policy as the CounteRGAN builders (the GP penalty's
    # norm and all loss reductions stay f32; casts are transposed by vjp)
    from cfgan.train.builders import make_mixed_precision

    g_apply = make_mixed_precision(g_apply, cfg.compute_dtype)
    d_apply = make_mixed_precision(d_apply, cfg.compute_dtype)

    step_fn = make_gan_step(
        g_apply=g_apply, d_apply=d_apply, tx_g=tx_g, tx_d=tx_d,
        latent_dim=ld, num_classes=num_classes if conditional else 0,
        loss=loss, g_before_d=cfg.g_before_d, n_critic=cfg.n_critic,
        gp_lambda=cfg.gp_lambda,
        # BatchNorm discriminators (DCGAN) must see real/fake separately
        separate_d_passes=d_stats,
    )

    @jax.jit
    def sample_fn(g_variables, z, cond_oh=None):
        args = (z, cond_oh) if conditional else (z,)
        if _has_train(g_model):
            return g_model.apply(g_variables, *args, train=False)
        return g_model.apply(g_variables, *args)

    return GANBundle(
        g_model, d_model, state, step_fn, make_epoch_runner(step_fn),
        sample_fn, ld, num_classes if conditional else 0,
    )
