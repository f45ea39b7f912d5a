from cfgan.core.config import (
    ClassifierConfig,
    CounterGANConfig,
    DataConfig,
    ExperimentConfig,
    GANConfig,
)
from cfgan.core.rng import RngStream

__all__ = [
    "ClassifierConfig",
    "CounterGANConfig",
    "DataConfig",
    "ExperimentConfig",
    "GANConfig",
    "RngStream",
]
