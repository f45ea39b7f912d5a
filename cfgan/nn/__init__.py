from cfgan.nn.gumbel import gumbel_softmax
from cfgan.nn.layers import (
    BatchNorm,
    Conv,
    ConvResBlock,
    ConvTranspose,
    Dropout,
    Embed,
    FiLM,
    FiLMResidualBlock,
    InstanceNorm,
    Linear,
    SpectralLinear,
    leaky_relu,
)

__all__ = [
    "BatchNorm",
    "Conv",
    "ConvResBlock",
    "ConvTranspose",
    "Dropout",
    "Embed",
    "FiLM",
    "FiLMResidualBlock",
    "InstanceNorm",
    "Linear",
    "SpectralLinear",
    "leaky_relu",
    "gumbel_softmax",
]
