"""Sample-grid / scatter / GIF outputs for the plain-generation families.

Covers the reference's progress artifacts: torchvision-`save_image`-style
grids (`simple_gan/mnist/mnist_gan.py:141`, `dconv_gan/mnist` fixed-noise
grids :187-191), real-vs-generated scatter plots
(`simple_gan/moons/make_moons_gan.py:109-138`), loss plots, and the training
GIF (`mnist_gan.py:146-155` — with the fps-from-last-batch-size bug fixed,
SURVEY.md section 2.11).
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def to_uint8_grid(images, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """NHWC float [-1,1] -> one HxW uint8 grid image."""
    imgs = np.asarray(images)
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    imgs = np.clip((imgs + 1.0) / 2.0, 0, 1)
    n, h, w, c = imgs.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.ones((nrows * (h + pad) + pad, ncol * (w + pad) + pad, c),
                   np.float32)
    for i in range(n):
        r, cidx = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + cidx * (w + pad)
        grid[y0 : y0 + h, x0 : x0 + w] = imgs[i]
    grid = (grid * 255).astype(np.uint8)
    return grid[..., 0] if c == 1 else grid


def save_image_grid(images, path: str, nrow: int = 8) -> str:
    grid = to_uint8_grid(images, nrow)
    plt = _mpl()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(grid, cmap="gray" if grid.ndim == 2 else None)
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def save_scatter(real, fake, path: str, labels=None) -> str:
    """Real-vs-generated 2-D scatter (`make_moons_gan.py:109-138`)."""
    plt = _mpl()
    real, fake = np.asarray(real), np.asarray(fake)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.scatter(real[:, 0], real[:, 1], s=8, alpha=0.4, label="real")
    if labels is None:
        ax.scatter(fake[:, 0], fake[:, 1], s=8, alpha=0.6, label="generated")
    else:
        labels = np.asarray(labels)
        for c in np.unique(labels):
            sel = labels == c
            ax.scatter(fake[sel, 0], fake[sel, 1], s=8, alpha=0.6,
                       label=f"generated c={c}")
    ax.legend()
    ax.set_title("Real vs generated")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def save_loss_plot(history: dict, path: str,
                   keys: Sequence[str] = ("g_loss", "d_loss")) -> str:
    plt = _mpl()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 5))
    for k in keys:
        if k in history:
            ax.plot(history[k], label=k)
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Loss")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def make_gif(frames: Sequence, path: str, fps: int = 5) -> str:
    """Assemble uint8 frames (arrays or PNG paths) into a GIF at a FIXED fps
    (the reference derives fps from the last batch size —
    `mnist_gan.py:155` — which is a bug, not a behavior)."""
    import imageio.v2 as imageio

    imgs = [imageio.imread(f) if isinstance(f, (str, os.PathLike)) else f
            for f in frames]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.mimsave(path, imgs, fps=fps)
    return path
