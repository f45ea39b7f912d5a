"""Discriminator / critic zoo.  All image tensors NHWC."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cfgan.nn import init as cinit
from cfgan.nn.layers import (
    BatchNorm,
    Conv,
    Embed,
    InstanceNorm,
    Linear,
    SpectralLinear,
    leaky_relu,
)


class SpectralMLPDiscriminator(nn.Module):
    """Spectral-norm MLP conditioned on a target one-hot.

    widths:
      house (`house models/discriminator.py:5-20`): (h, 2h, 4h, 1)
      moons (`moons/models/discriminator.py:6-22`): (h, h/2, h/2, 1)
    """

    hidden_dims: tuple[int, ...] = (32, 64, 128)

    @nn.compact
    def __call__(self, x, target_onehot, update_stats: bool = True):
        h = jnp.concatenate([x, target_onehot], axis=1)
        for i, width in enumerate(self.hidden_dims):
            h = SpectralLinear(width, name=f"sn{i}")(h, update_stats=update_stats)
            h = leaky_relu(h, 0.2)
        return SpectralLinear(1, name="sn_out")(h, update_stats=update_stats)


class CondConvDiscriminator(nn.Module):
    """MNIST CounteRGAN conditional discriminator
    (`mnist/models/discriminator.py:5-38`): label plane concat -> 4 strided
    convs (64/128/256/256, bias-free, LeakyReLU(0.2), no norm) -> global
    average pool -> Linear(256 -> 1) logit head."""

    num_classes: int = 10
    d_hidden: int = 64

    @nn.compact
    def __call__(self, x, cond_idx):
        b, h, w, c = x.shape
        plane = Embed(self.num_classes, h * w, name="cond_embed")(cond_idx).reshape(
            b, h, w, 1
        )
        z = jnp.concatenate([x, plane], axis=-1)
        for i, ch in enumerate(
            (self.d_hidden, self.d_hidden * 2, self.d_hidden * 4, self.d_hidden * 4)
        ):
            z = Conv(ch, 3, 2, 1, use_bias=False, name=f"conv{i}")(z)
            z = leaky_relu(z, 0.2)
        z = jnp.mean(z, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        return Linear(1, name="adv_head")(z)


class MLPDiscriminator(nn.Module):
    """simple_gan MLP discriminators.

    moons (`make_moons_gan.py:40-46`): 2 -> 128 -> 1 sigmoid (ReLU).
    mnist (`mnist_gan.py:66-82`): 784 -> 512 -> 256 -> 1 sigmoid
    (LeakyReLU(0.2)) — pass hidden_dims=(512, 256), slope=0.2, flatten=True.
    """

    hidden_dims: tuple[int, ...] = (128,)
    negative_slope: float = 0.0  # 0 => plain ReLU
    flatten: bool = False

    @nn.compact
    def __call__(self, x):
        if self.flatten:
            x = x.reshape(x.shape[0], -1)
        for width in self.hidden_dims:
            x = Linear(width)(x)
            x = leaky_relu(x, self.negative_slope) if self.negative_slope else jax.nn.relu(x)
        return jax.nn.sigmoid(Linear(1)(x))


class ConditionalMLPDiscriminator(nn.Module):
    """conditional_gan/moons: concat[x, onehot] -> 128 -> 1 sigmoid
    (`make_moons_cgan.py:48-60`)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x, label_onehot):
        h = jnp.concatenate([x, label_onehot], axis=1)
        h = jax.nn.relu(Linear(self.hidden_dim)(h))
        return jax.nn.sigmoid(Linear(1)(h))


class DCGANDiscriminator(nn.Module):
    """dconv_gan/mnist: 5 strided convs (64/128/256/512/1, k4, BN except
    first/last, LeakyReLU(0.2)) -> sigmoid (`mnist_dcgan.py:96-116`)."""

    d_hidden: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        init = cinit.normal(0.02)
        h = Conv(self.d_hidden, 4, 2, 1, use_bias=False, kernel_init=init,
                 name="conv0")(x)
        h = leaky_relu(h, 0.2)
        for i, ch in enumerate(
            (self.d_hidden * 2, self.d_hidden * 4, self.d_hidden * 8), start=1
        ):
            h = Conv(ch, 4, 2, 1, use_bias=False, kernel_init=init, name=f"conv{i}")(h)
            h = BatchNorm(scale_init=_dcgan_bn_scale, name=f"bn{i}")(
                h, use_running_average=not train
            )
            h = leaky_relu(h, 0.2)
        h = Conv(1, 4, 1, 0, use_bias=False, kernel_init=init, name="conv_out")(h)
        return jax.nn.sigmoid(h.reshape(h.shape[0]))


def _dcgan_bn_scale(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class WGANCritic(nn.Module):
    """conditional_gan/mnist critic (`mnist_wgan_conditional.py:80-108`):
    class-embed 10 -> 4096; Conv k3 s2 (no padding) x3 with affine
    InstanceNorm + LeakyReLU -> flatten (2x2x1024) -> concat -> MLP
    8192 -> 1024 -> 1."""

    critic_size: int = 1024
    hidden_size: int = 1024
    num_classes: int = 10

    @nn.compact
    def __call__(self, image, condition_onehot):
        cs = self.critic_size
        vc = Linear(cs * 4, name="cond_embed")(condition_onehot)
        h = image
        for i, ch in enumerate((cs // 4, cs // 2, cs)):
            h = Conv(ch, 3, 2, 0, name=f"conv{i}")(h)
            h = InstanceNorm(name=f"in{i}")(h)
            h = leaky_relu(h, 0.2)
        h = h.reshape(h.shape[0], -1)
        h = jnp.concatenate([h, vc], axis=1)
        h = leaky_relu(Linear(self.hidden_size, name="fc0")(h), 0.2)
        return Linear(1, name="fc_out")(h)


class ConvDiscriminator(nn.Module):
    """Legacy unconditional flat conv discriminator
    (`mnist/modules/discriminator.py:4-23`): strided convs -> pooled logit.
    Accepts-and-ignores a condition argument so it is interchangeable with
    the conditional discriminator in the CounteRGAN step."""

    d_hidden: int = 64

    @nn.compact
    def __call__(self, x, cond_idx=None):
        z = x
        for i, ch in enumerate((self.d_hidden, self.d_hidden * 2,
                                self.d_hidden * 4)):
            z = Conv(ch, 3, 2, 1, name=f"conv{i}")(z)
            z = leaky_relu(z, 0.2)
        z = jnp.mean(z, axis=(1, 2))
        return Linear(1, name="head")(z)
