from cfgan.models.classifiers import CNNClassifier, MLPClassifier, TabularClassifier
from cfgan.models.discriminators import (
    CondConvDiscriminator,
    ConditionalMLPDiscriminator,
    DCGANDiscriminator,
    MLPDiscriminator,
    SpectralMLPDiscriminator,
    WGANCritic,
)
from cfgan.models.generators import (
    ConditionalMLPGenerator,
    DCGANGenerator,
    ImageResidualGenerator,
    MLPGenerator,
    MLPImageGenerator,
    MoonsResidualGenerator,
    TabularResidualGenerator,
    WGANGenerator,
)

__all__ = [
    "CNNClassifier",
    "MLPClassifier",
    "TabularClassifier",
    "CondConvDiscriminator",
    "ConditionalMLPDiscriminator",
    "DCGANDiscriminator",
    "MLPDiscriminator",
    "SpectralMLPDiscriminator",
    "WGANCritic",
    "ConditionalMLPGenerator",
    "DCGANGenerator",
    "ImageResidualGenerator",
    "MLPGenerator",
    "MLPImageGenerator",
    "MoonsResidualGenerator",
    "TabularResidualGenerator",
    "WGANGenerator",
]
