"""Generator zoo: the three CounteRGAN residual generators plus the four
plain-generation families.  All image tensors are NHWC.
"""
from __future__ import annotations

from typing import Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cfgan.nn import init as cinit
from cfgan.nn.gumbel import gumbel_softmax
from cfgan.nn.layers import (
    BatchNorm,
    Conv,
    ConvResBlock,
    ConvTranspose,
    Embed,
    FiLMResidualBlock,
    Linear,
    leaky_relu,
)


# --------------------------------------------------------------- CounteRGAN
class MoonsResidualGenerator(nn.Module):
    """MLP residual generator: concat[x, onehot, mask] -> 32 -> 32 -> 16 -> 2
    with BatchNorm1d+ReLU (`moons/models/generator.py:4-24`).
    Returns (raw_residual, masked_residual)."""

    input_dim: int = 2
    hidden_dim: int = 32

    @nn.compact
    def __call__(self, x, target_onehot, mask, train: bool = True):
        h = jnp.concatenate([x, target_onehot, mask], axis=1)
        for width in (self.hidden_dim, self.hidden_dim, self.hidden_dim // 2):
            h = Linear(width)(h)
            h = BatchNorm()(h, use_running_average=not train)
            h = jax.nn.relu(h)
        raw = Linear(self.input_dim)(h)
        return raw, raw * mask


class TabularResidualGenerator(nn.Module):
    """FiLM-conditioned tabular residual generator with Gumbel-Softmax
    categorical heads (`house models/generator.py:38-91`).

    cond = concat[target_onehot, mask]; continuous head scaled by
    residual_scaling; one logits head per categorical feature, sampled with
    straight-through Gumbel-Softmax (rng collection 'gumbel').

    Returns (cont_residual, cat_logits, cat_samples) where cat_* map
    feature index -> (B, n_values) arrays.
    """

    input_dim: int
    hidden_dim: int
    num_classes: int
    continuous_idx: Sequence[int]
    categorical_info: Mapping[int, Sequence[float]]  # idx -> raw values
    n_blocks: int = 5
    residual_scaling: float = 0.1
    tau: float = 0.5
    # run the categorical heads + Gumbel-Softmax in f32 even when the trunk
    # computes in bf16: exp((logits+g)/tau) at tau=0.5 amplifies bf16 logit
    # quantization into argmax flips — the precision-sensitive site of the
    # tabular family (no-op under f32 compute)
    cat_head_f32: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        target_onehot,
        mask=None,
        temperature: float | None = None,
        hard: bool = False,
        train: bool = True,
        gumbel_noise=None,  # idx -> (B, n) noise; overrides the rng draw
    ):
        if mask is None:
            mask = jnp.ones_like(x)
        cond = jnp.concatenate([target_onehot, mask], axis=1)
        h = jnp.concatenate([x, cond], axis=1)
        h = jax.nn.relu(Linear(self.hidden_dim, name="fc_in")(h))
        for i in range(self.n_blocks):
            h = FiLMResidualBlock(self.hidden_dim, name=f"block{i}")(h, cond, train)

        cont_residual = (
            Linear(len(self.continuous_idx), name="fc_cont")(h) * self.residual_scaling
        )

        tau = self.tau if temperature is None else float(temperature)
        h_cat = h.astype(jnp.float32) if self.cat_head_f32 else h
        cat_logits, cat_samples = {}, {}
        for idx in sorted(self.categorical_info):
            n = len(self.categorical_info[idx])
            # f32 input @ bf16 kernel promotes to f32, so with cat_head_f32
            # the head matmul, softmax and argmax all run in f32
            logits = Linear(n, name=f"fc_cat_{idx}")(h_cat)
            cat_logits[idx] = logits
            if gumbel_noise is not None:
                cat_samples[idx] = gumbel_softmax(
                    None, logits, tau=tau, hard=hard,
                    noise=gumbel_noise[idx],
                )
            else:
                key = self.make_rng("gumbel")
                cat_samples[idx] = gumbel_softmax(key, logits, tau=tau,
                                                  hard=hard)
        return cont_residual, cat_logits, cat_samples


class ImageResidualGenerator(nn.Module):
    """MNIST residual generator (`mnist/models/generator.py:25-86`).

    Label embedding -> HxW conditioning plane; input concat[x, plane, mask];
    Conv(3->64) -> n damped ResBlocks -> mid conv -> out conv * 0.1.
    Kaiming-normal(a=0.2) conv init, N(0,.01) embedding init.
    Returns (raw_residual, masked_residual); clamp happens outside.
    """

    image_hw: tuple[int, int] = (28, 28)
    num_classes: int = 10
    base_ch: int = 64
    n_resblocks: int = 6
    residual_scaling: float = 0.1
    #: "matmul" lowers all fourteen 3x3 convs through the shifted-tap
    #: matmul decomposition (cfgan.ops.conv) — same params/init, different
    #: XLA tiling path (the batch>=256 conv-tiling-cliff lever)
    conv_impl: str | None = None

    @nn.compact
    def __call__(self, x, target, mask, train: bool = True):
        b, h, w, c = x.shape
        kinit = cinit.kaiming_normal(0.2)
        plane = Embed(
            self.num_classes, h * w, embedding_init=cinit.normal(0.01), name="embed"
        )(target).reshape(b, h, w, 1)
        inp = jnp.concatenate([x, plane, mask], axis=-1)

        z = leaky_relu(Conv(self.base_ch, 3, 1, 1, kernel_init=kinit,
                            name="conv_in", impl=self.conv_impl)(inp))
        for i in range(self.n_resblocks):
            z = ConvResBlock(self.base_ch, name=f"res{i}",
                             conv_impl=self.conv_impl)(z, train)
        z = leaky_relu(Conv(self.base_ch, 3, 1, 1, kernel_init=kinit,
                            name="conv_mid", impl=self.conv_impl)(z))
        raw = Conv(c, 3, 1, 1, kernel_init=kinit, name="conv_out",
                   impl=self.conv_impl)(z) * self.residual_scaling
        return raw, raw * mask


# --------------------------------------------------------- plain generation
class MLPGenerator(nn.Module):
    """simple_gan/moons: z -> hidden -> 2 with ReLU
    (`make_moons_gan.py:33-38`)."""

    out_dim: int = 2
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, z):
        return Linear(self.out_dim)(jax.nn.relu(Linear(self.hidden_dim)(z)))


class ConditionalMLPGenerator(nn.Module):
    """conditional_gan/moons: concat[z, onehot] -> hidden -> 2
    (`make_moons_cgan.py:35-46`)."""

    out_dim: int = 2
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, z, label_onehot):
        h = jnp.concatenate([z, label_onehot], axis=1)
        return Linear(self.out_dim)(jax.nn.relu(Linear(self.hidden_dim)(h)))


class MLPImageGenerator(nn.Module):
    """simple_gan/mnist: z100 -> [Linear+BN+LeakyReLU(0.2)] x4
    (128/256/512/1024, first block unnormalized) -> 784 Tanh
    (`mnist_gan.py:41-64`).  NB torch writes BatchNorm1d(out, 0.8) — the 0.8
    lands on *eps*, reproduced here deliberately."""

    img_shape: tuple[int, int, int] = (28, 28, 1)

    @nn.compact
    def __call__(self, z, train: bool = True):
        h = z
        for width, normalize in ((128, False), (256, True), (512, True), (1024, True)):
            h = Linear(width)(h)
            if normalize:
                h = BatchNorm(epsilon=0.8)(h, use_running_average=not train)
            h = leaky_relu(h, 0.2)
        out_dim = self.img_shape[0] * self.img_shape[1] * self.img_shape[2]
        h = jnp.tanh(Linear(out_dim)(h))
        return h.reshape(h.shape[0], *self.img_shape)


class DCGANGenerator(nn.Module):
    """dconv_gan/mnist: z(100) -> ConvT x5 (512/256/128/64/1, k4, BN, ReLU,
    Tanh) -> 64x64, DCGAN N(0,.02) init (`mnist_dcgan.py:72-93`)."""

    g_hidden: int = 64
    channels: int = 1

    @nn.compact
    def __call__(self, z, train: bool = True):
        init = cinit.normal(0.02)
        bn_init = cinit.normal  # BN scale N(1,.02): custom below
        h = z.reshape(z.shape[0], 1, 1, z.shape[-1])
        specs = [
            (self.g_hidden * 8, 4, 1, 0),
            (self.g_hidden * 4, 4, 2, 1),
            (self.g_hidden * 2, 4, 2, 1),
            (self.g_hidden, 4, 2, 1),
        ]
        for i, (ch, k, s, p) in enumerate(specs):
            h = ConvTranspose(ch, k, s, p, use_bias=False, kernel_init=init,
                              name=f"tconv{i}")(h)
            h = BatchNorm(scale_init=_dcgan_bn_scale, name=f"bn{i}")(
                h, use_running_average=not train
            )
            h = jax.nn.relu(h)
        h = ConvTranspose(self.channels, 4, 2, 1, use_bias=False, kernel_init=init,
                          name="tconv_out")(h)
        return jnp.tanh(h)


def _dcgan_bn_scale(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class WGANGenerator(nn.Module):
    """conditional_gan/mnist WGAN-GP generator
    (`mnist_wgan_conditional.py:51-78`): latent/class embeds (32->512,
    10->512) concat -> (1,1,1024) -> ConvT 1024(k4s1) / 512(k3s2p1) /
    256(k4s2p1) / 1(k4s2p1) + Tanh = 28x28."""

    generator_size: int = 1024
    num_classes: int = 10

    @nn.compact
    def __call__(self, latent, condition_onehot, train: bool = True):
        gs = self.generator_size
        vz = Linear(gs // 2, name="latent_embed")(latent)
        vc = Linear(gs // 2, name="cond_embed")(condition_onehot)
        h = jnp.concatenate([vz, vc], axis=1).reshape(-1, 1, 1, gs)
        for name, (ch, k, s, p) in {
            "tconv0": (gs, 4, 1, 0),
            "tconv1": (gs // 2, 3, 2, 1),
            "tconv2": (gs // 4, 4, 2, 1),
        }.items():
            h = ConvTranspose(ch, k, s, p, name=name)(h)
            h = BatchNorm(name=f"bn_{name}")(h, use_running_average=not train)
            h = jax.nn.relu(h)
        h = ConvTranspose(1, 4, 2, 1, name="tconv_out")(h)
        return jnp.tanh(h)


class DeltaImageGenerator(nn.Module):
    """Legacy mask-free delta generator (superseded stack,
    `mnist/modules/generator.py:4-22`, used by `mnist/gan_train.py:115-148`
    and `countergan2.py`): conv encoder -> tanh-bounded additive delta.
    Conditioning is a label plane like the current generator so the legacy
    fixed-target/random-target trainers share one interface; returns
    (raw_delta, raw_delta) — there is no mask in this family, the framework
    treats it as mask == ones."""

    num_classes: int = 10
    base_ch: int = 32
    delta_scale: float = 1.0

    @nn.compact
    def __call__(self, x, target, mask=None, train: bool = True):
        b, h, w, c = x.shape
        plane = Embed(self.num_classes, h * w, embedding_init=cinit.normal(0.01),
                      name="embed")(target).reshape(b, h, w, 1)
        z = jnp.concatenate([x, plane], axis=-1)
        z = leaky_relu(Conv(self.base_ch, 3, 1, 1, name="conv0")(z))
        z = BatchNorm(name="bn0")(z, use_running_average=not train)
        z = leaky_relu(Conv(self.base_ch, 3, 1, 1, name="conv1")(z))
        z = BatchNorm(name="bn1")(z, use_running_average=not train)
        delta = jnp.tanh(Conv(c, 3, 1, 1, name="conv_out")(z)) * self.delta_scale
        return delta, delta
