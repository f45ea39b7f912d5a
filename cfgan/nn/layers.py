"""Core layers (flax.linen) with reference-equivalent semantics.

Covers the full primitive inventory of SURVEY.md section 2.8: Linear, Conv2d,
ConvTranspose2d, BatchNorm (train/eval), InstanceNorm(affine), spectral norm
(power iteration as carried state), Embedding label-planes, Dropout, FiLM,
residual blocks, and the activation set.
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cfgan.nn import init as cinit


def leaky_relu(x, negative_slope: float = 0.2):
    return jax.nn.leaky_relu(x, negative_slope)


class Linear(nn.Module):
    """Dense layer with torch-default init (U(+-1/sqrt(fan_in)))."""

    features: int
    use_bias: bool = True
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kinit = self.kernel_init or cinit.torch_kernel_init
        kernel = self.param("kernel", kinit, (in_f, self.features))
        y = x @ kernel
        if self.use_bias:
            binit = self.bias_init or cinit.scaled_uniform(in_f)
            y = y + self.param("bias", binit, (self.features,))
        return y


class _Conv3x3Matmul(nn.Module):
    """Drop-in 3x3/SAME/stride-1 conv computing via the shifted-tap matmul
    decomposition (`cfgan.ops.conv.conv3x3_same_matmul`) instead of
    lax.conv — sidesteps the XLA conv-tiling cliff at the 28x28/64-ch
    generator shapes (BASELINE.md "Batch scaling").

    Parameter names, shapes, dtypes and init RNG derivation are IDENTICAL
    to flax nn.Conv's (kernel (3,3,Cin,Cout) + bias (Cout,)), and callers
    pin the child scope name to "Conv_0", so checkpoints and oracles are
    interchangeable between implementations bit-for-bit."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = None  # set by Conv
    bias_init: Callable = None
    variant: str = "matmul"  # matmul | pallas

    @nn.compact
    def __call__(self, x):
        from cfgan.ops.conv import (
            conv3x3_same_matmul,
            make_conv3x3_same_pallas,
        )

        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, x.shape[-1], self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        # match nn.Conv's compute-dtype promotion (params are cast to the
        # compute dtype upstream by make_mixed_precision)
        kernel = kernel.astype(x.dtype)
        bias = bias.astype(x.dtype) if bias is not None else None
        if self.variant == "pallas":
            y = make_conv3x3_same_pallas()(x, kernel)
            return y if bias is None else y + bias
        return conv3x3_same_matmul(x, kernel, bias)


class Conv(nn.Module):
    """2-D convolution (NHWC) with torch-default init and torch-style
    integer padding.

    `impl="matmul"` lowers the 3x3/stride-1/pad-1 case through the
    shifted-tap matmul decomposition (same params, same init — see
    _Conv3x3Matmul); any other geometry falls back to lax.conv."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Callable | None = None
    impl: str | None = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        fan_in = x.shape[-1] * k * k
        kinit = self.kernel_init or cinit.torch_kernel_init
        binit = cinit.scaled_uniform(fan_in)
        impl = self.impl
        if (impl == "pallas" and (x.shape[-1] < 16 or self.features < 16)):
            # Lane-starved channel counts (conv_in's Cin=3, conv_out's
            # Cout=1) pad to 128 lanes in VMEM and blow the Mosaic scoped
            # budget (measured: 16.66M vs the 16M stack limit at batch
            # 128) for near-zero MXU work — keep those on lax.conv and
            # reserve the kernel for the 64->64 resblock hot path.
            impl = None
        if (impl in ("matmul", "pallas") and k == 3
                and self.stride == 1 and self.padding == 1):
            return _Conv3x3Matmul(
                self.features, use_bias=self.use_bias, kernel_init=kinit,
                bias_init=binit, variant=impl, name="Conv_0",
            )(x)
        conv = nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
        )
        return conv(x)


class ConvTranspose(nn.Module):
    """2-D transposed convolution matching torch ConvTranspose2d geometry.

    torch output size: (H-1)*stride - 2*padding + kernel.  flax
    ConvTranspose with padding [(k-1-p, k-1-p)] and no dilation reproduces it;
    we use lax.conv_transpose via flax with explicit padding numbers.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        # torch ConvTranspose2d fan_in (for default init) = out_ch * k * k
        # (its weight is (in, out, k, k) and torch computes fan_in over dim 1).
        fan_in = self.features * k * k
        conv = nn.ConvTranspose(
            self.features,
            (k, k),
            strides=(s, s),
            padding=[(k - 1 - p, k - 1 - p)] * 2,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or cinit.torch_kernel_init,
            bias_init=cinit.scaled_uniform(fan_in),
            transpose_kernel=True,
        )
        return conv(x)


class BatchNorm(nn.Module):
    """BatchNorm with exact torch semantics: normalization by *biased* batch
    variance, running variance updated with the *unbiased* batch variance
    (torch's documented behavior; flax's BatchNorm updates with the biased
    one, which diverges run-stat parity).  momentum 0.9 here == torch 0.1;
    eps 1e-5.  Running stats live in the 'batch_stats' collection.

    Set `axis_name` for cross-replica (sync) BN under shard_map/pmap; the
    default per-replica stats match single-GPU reference semantics
    (SURVEY.md section 7 "BatchNorm under DP").
    """

    use_running_average: bool | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    scale_init: Callable = cinit.ones
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )

        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            n = 1
            for a in axes:
                n *= x.shape[a]
            mean = jnp.mean(x, axes)
            mean_sq = jnp.mean(jax.lax.square(x), axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                n *= jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean_sq - jax.lax.square(mean), 0.0)
            if not self.is_initializing() and self.is_mutable_collection(
                "batch_stats"
            ):
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", self.scale_init, (feat,))
        if self.use_bias:
            y = y + self.param("bias", cinit.zeros, (feat,))
        return y


def max_pool2d(x, window: int = 2, stride: int | None = None):
    """torch nn.MaxPool2d semantics on NHWC: kernel `window`, stride
    defaulting to the kernel, no padding, floor output size (trailing rows/
    cols that don't fill a window are dropped).  Needed by the legacy MNIST
    classifier (`mnist/modules/classifier.py:10-13`)."""
    stride = stride or window
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True) equivalent: per-sample per-channel stats
    over spatial dims (torch track_running_stats=False default)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # NHWC
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", cinit.ones, (x.shape[-1],))
        bias = self.param("bias", cinit.zeros, (x.shape[-1],))
        return y * scale + bias


def _l2_normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class SpectralLinear(nn.Module):
    """Linear layer under spectral normalization.

    Matches torch `nn.utils.spectral_norm(nn.Linear(...))`: one power
    iteration per forward while training (`update_stats=True`), u carried as
    state in the 'spectral_stats' collection, sigma computed with u/v
    detached so gradients flow only through the kernel
    (reference usage: `house models/discriminator.py:9-15`,
    `moons/models/discriminator.py:10-17`).
    """

    features: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        in_f = x.shape[-1]
        kernel = self.param("kernel", cinit.torch_kernel_init, (in_f, self.features))
        bias = self.param("bias", cinit.scaled_uniform(in_f), (self.features,))

        u_var = self.variable(
            "spectral_stats",
            "u",
            lambda: _l2_normalize(
                jax.random.normal(self.make_rng("params"), (self.features,))
            ),
        )
        u = u_var.value
        if update_stats:
            # torch power iteration: v = norm(W^T u); u = norm(W v)
            # with jax kernel K = W^T of shape (in, out):
            v = _l2_normalize(kernel @ u, self.eps)
            u = _l2_normalize(v @ kernel, self.eps)
            if not self.is_initializing() and self.is_mutable_collection(
                "spectral_stats"
            ):
                u_var.value = u
        else:
            v = _l2_normalize(kernel @ u, self.eps)
        u_d = jax.lax.stop_gradient(u)
        v_d = jax.lax.stop_gradient(v)
        sigma = jnp.einsum("i,io,o->", v_d, kernel, u_d)
        return x @ (kernel / sigma) + bias


class Embed(nn.Module):
    """Embedding table; default init N(0,1) like torch nn.Embedding."""

    num_embeddings: int
    features: int
    embedding_init: Callable | None = None

    @nn.compact
    def __call__(self, idx):
        table = self.param(
            "embedding",
            self.embedding_init or cinit.normal(1.0),
            (self.num_embeddings, self.features),
        )
        return jnp.take(table, idx, axis=0)


class FiLM(nn.Module):
    """Feature-wise linear modulation (reference
    `house models/generator.py:6-16`)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, h, cond):
        g = Linear(self.hidden_dim, name="gamma")(cond)
        b = Linear(self.hidden_dim, name="beta")(cond)
        return g * h + b


class FiLMResidualBlock(nn.Module):
    """Tabular residual block: Linear-BN-FiLM-ReLU-Linear-BN-FiLM + skip,
    with ONE shared FiLM instance used at both sites (the reference reuses
    `self.film`, `house models/generator.py:27,31-34`)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, h, cond, train: bool):
        film = FiLM(self.hidden_dim, name="film")
        out = Linear(self.hidden_dim, name="fc1")(h)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = jax.nn.relu(film(out, cond))
        out = Linear(self.hidden_dim, name="fc2")(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        out = film(out, cond)
        return h + out


class ConvResBlock(nn.Module):
    """Image residual block with damped residual path: identity + 0.1*out
    (reference `mnist/models/generator.py:5-22`)."""

    channels: int
    damping: float = 0.1
    negative_slope: float = 0.2
    conv_impl: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        kinit = cinit.kaiming_normal(self.negative_slope)
        out = Conv(self.channels, 3, 1, 1, kernel_init=kinit, name="conv1",
                   impl=self.conv_impl)(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = leaky_relu(out, self.negative_slope)
        out = Conv(self.channels, 3, 1, 1, kernel_init=kinit, name="conv2",
                   impl=self.conv_impl)(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        return x + self.damping * out


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.Dropout(self.rate, deterministic=not train)(x)
