from cfgan.train.state import GANState, NetState, adam_like_torch, global_grad_norm
from cfgan.train.classifier import train_classifier
from cfgan.train.countergan import make_countergan_step, make_epoch_runner

__all__ = [
    "GANState",
    "NetState",
    "adam_like_torch",
    "global_grad_norm",
    "train_classifier",
    "make_countergan_step",
    "make_epoch_runner",
]
