"""Image counterfactual visualizations (MNIST pipeline).

TPU-native rebuild of the reference visual suite:
* source x target CF grid with success borders
  (`mnist/eval_utils.py:113-201`),
* per-sample Original|CF|Residual|Mask heatmap panels + batch overview
  (`mnist/eval_utils.py:346-441`),
* numbered patch-grid overlay (`mnist/eval_utils.py:443-484`),
* single-sample user-modification panel, the serving visual
  (`mnist/eval_utils.py:498-568`).

All generation happens in ONE jitted call per figure: the source x target
grid is a single (num_sources*num_targets)-batch fused G+classifier forward
instead of the reference's 100 sequential per-cell forwards.
"""
from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cfgan.masks.patch import patch_grid_dims, patch_indices_to_mask


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _img(x) -> np.ndarray:
    """NHWC/HWC [-1,1] -> HxW [0,1] for display."""
    a = np.asarray(x)
    if a.ndim == 3:
        a = a[..., 0]
    return (a + 1.0) / 2.0


def pick_one_per_class(x, y, num_classes: int, seed: int = 0):
    """One exemplar per source class (first match, deterministic)."""
    y = np.asarray(y)
    idx = []
    for c in range(num_classes):
        where = np.nonzero(y == c)[0]
        if len(where) == 0:
            raise ValueError(f"no sample of class {c} in the evaluation set")
        idx.append(int(where[seed % len(where)]))
    return np.asarray(x)[idx], np.asarray(idx)


def counterfactual_grid(
    cf_fn,
    clf_fn,
    g_vars,
    x,
    y,
    num_classes: int,
    path: str,
    mask=None,
    key=None,
    seed: int = 0,
):
    """num_classes x num_classes grid: rows = source digit, cols = target.
    Green border = classifier flipped to the target, red = it did not.
    Returns the (num_classes, num_classes) flip matrix."""
    sources, _ = pick_one_per_class(x, y, num_classes, seed)
    n = num_classes
    # one fused forward over all (source, target) cells
    xs = jnp.asarray(np.repeat(sources, n, axis=0))  # (n*n, H, W, C)
    ts = jnp.tile(jnp.arange(n, dtype=jnp.int32), n)
    m = jnp.ones_like(xs) if mask is None else jnp.asarray(
        np.repeat(np.asarray(mask), n, axis=0)
    )
    x_cf, raw, masked = cf_fn(g_vars, xs, ts, m, key)
    preds = np.asarray(jnp.argmax(clf_fn(x_cf), axis=1))
    x_cf = np.asarray(x_cf)
    flips = (preds == np.asarray(ts)).reshape(n, n)

    plt = _mpl()
    fig, axes = plt.subplots(n, n, figsize=(1.1 * n, 1.1 * n))
    for s in range(n):
        for t in range(n):
            ax = axes[s, t]
            ax.imshow(_img(x_cf[s * n + t]), cmap="gray", vmin=0, vmax=1)
            ax.set_xticks([])
            ax.set_yticks([])
            color = "green" if flips[s, t] else "red"
            for spine in ax.spines.values():
                spine.set_color(color)
                spine.set_linewidth(2)
            if s == 0:
                ax.set_title(str(t), fontsize=9)
            if t == 0:
                ax.set_ylabel(str(s), fontsize=9, rotation=0, labelpad=10)
    fig.suptitle("Counterfactual grid: rows=source, cols=target", fontsize=11)
    fig.tight_layout(rect=(0, 0, 1, 0.97))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return flips


def heatmap_panels(
    cf_fn,
    clf_fn,
    g_vars,
    x,
    y,
    targets,
    mask,
    out_dir: str,
    key=None,
    max_samples: int = 8,
):
    """Per-sample Original | Counterfactual | Residual | Mask panels plus one
    batch-overview figure (`mnist/eval_utils.py:346-441`)."""
    os.makedirs(out_dir, exist_ok=True)
    x = jnp.asarray(x)[:max_samples]
    t = jnp.asarray(targets)[:max_samples]
    m = jnp.asarray(mask)[:max_samples]
    y = np.asarray(y)[:max_samples]
    x_cf, raw, masked = cf_fn(g_vars, x, t, m, key)
    logits = clf_fn(x_cf)
    preds = np.asarray(jnp.argmax(logits, axis=1))
    conf = np.asarray(jnp.max(jax.nn.softmax(logits, axis=1), axis=1))

    plt = _mpl()
    n = int(x.shape[0])
    for i in range(n):
        fig, axes = plt.subplots(1, 4, figsize=(10, 2.8))
        panels = [
            (_img(x[i]), f"Original (y={y[i]})", "gray", (0, 1)),
            (_img(x_cf[i]),
             f"CF -> {int(t[i])} | pred {preds[i]} ({conf[i]:.2f})",
             "gray", (0, 1)),
            (np.asarray(masked[i])[..., 0], "Residual", "seismic", (-1, 1)),
            (np.asarray(m[i])[..., 0], "Mask", "viridis", (0, 1)),
        ]
        for ax, (img, title, cmap, (vmin, vmax)) in zip(axes, panels):
            im = ax.imshow(img, cmap=cmap, vmin=vmin, vmax=vmax)
            ax.set_title(title, fontsize=9)
            ax.axis("off")
            fig.colorbar(im, ax=ax, fraction=0.046)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"sample_{i}.png"), dpi=120)
        plt.close(fig)

    # batch overview: originals on row 0, CFs row 1, residuals row 2
    fig, axes = plt.subplots(3, n, figsize=(1.2 * n, 3.8), squeeze=False)
    for i in range(n):
        axes[0, i].imshow(_img(x[i]), cmap="gray", vmin=0, vmax=1)
        axes[1, i].imshow(_img(x_cf[i]), cmap="gray", vmin=0, vmax=1)
        axes[2, i].imshow(np.asarray(masked[i])[..., 0], cmap="seismic",
                          vmin=-1, vmax=1)
        for r in range(3):
            axes[r, i].axis("off")
        axes[0, i].set_title(f"{y[i]}->{int(t[i])}", fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "batch_overview.png"), dpi=120)
    plt.close(fig)
    return {"preds": preds, "confidence": conf}


def patch_grid_overlay(
    x_sample,
    patch_size: int,
    path: str,
    highlight: Sequence[int] = (),
):
    """Numbered patch grid over one image (`mnist/eval_utils.py:443-484`):
    row-major patch indices, optional highlighted (modifiable) patches."""
    img = _img(x_sample)
    h, w = img.shape
    ph, pw = patch_grid_dims(h, w, patch_size)
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(img, cmap="gray", vmin=0, vmax=1)
    hl = set(int(i) for i in highlight)
    for p in range(ph * pw):
        r, c = divmod(p, pw)
        y0, x0 = r * patch_size, c * patch_size
        ax.add_patch(
            plt.Rectangle(
                (x0 - 0.5, y0 - 0.5), patch_size, patch_size,
                fill=p in hl, facecolor=(0, 1, 0, 0.25) if p in hl else None,
                edgecolor="yellow", linewidth=0.8,
            )
        )
        ax.text(x0 + patch_size / 2 - 0.5, y0 + patch_size / 2 - 0.5, str(p),
                color="red", fontsize=8, ha="center", va="center")
    ax.axis("off")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def user_modification_example(
    cf_fn,
    clf_fn,
    g_vars,
    x_sample,
    target: int,
    patch_indices: Sequence[int],
    patch_size: int,
    path: str | None = None,
    key=None,
):
    """Single-sample promptable CF: user patch list -> mask -> fused
    G+classifier forward -> 4-panel PNG (`mnist/eval_utils.py:498-568`).
    Returns dict(pred, confidence, x_cf, mask)."""
    x = jnp.asarray(x_sample)[None]
    h, w = x.shape[1], x.shape[2]
    mask = patch_indices_to_mask(patch_indices, 1, (h, w), patch_size,
                                 channels=x.shape[-1])
    t = jnp.asarray([target], jnp.int32)
    x_cf, raw, masked = cf_fn(g_vars, x, t, mask, key)
    logits = clf_fn(x_cf)
    probs = jax.nn.softmax(logits, axis=1)
    pred = int(jnp.argmax(logits, axis=1)[0])
    conf = float(probs[0, pred])

    if path is not None:
        plt = _mpl()
        fig, axes = plt.subplots(1, 4, figsize=(10, 2.8))
        panels = [
            (_img(x[0]), "Original", "gray", (0, 1)),
            (_img(x_cf[0]), f"CF -> {target} | pred {pred} ({conf:.2f})",
             "gray", (0, 1)),
            (np.asarray(masked[0])[..., 0], "Residual", "seismic", (-1, 1)),
            (np.asarray(mask[0])[..., 0],
             f"Mask (patches {list(patch_indices)})", "viridis", (0, 1)),
        ]
        for ax, (img, title, cmap, (vmin, vmax)) in zip(axes, panels):
            ax.imshow(img, cmap=cmap, vmin=vmin, vmax=vmax)
            ax.set_title(title, fontsize=9)
            ax.axis("off")
        fig.tight_layout()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.savefig(path, dpi=120)
        plt.close(fig)

    return {
        "pred": pred,
        "confidence": conf,
        "x_cf": np.asarray(x_cf[0]),
        "mask": np.asarray(mask[0]),
        "residual": np.asarray(masked[0]),
    }
