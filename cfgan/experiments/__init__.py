from cfgan.experiments.presets import PRESETS

__all__ = ["PRESETS"]
