"""2-D decision-boundary visualizations for the moons pipeline.

Equivalent of `moons/eval_utils.py:109-224` (`plot_decision_boundaries_and_cfs`
and `plot_decision_boundaries_only`) and the dataset scatter of the moons
Gradio app: classifier decision surface on a dense grid (one jitted forward)
with counterfactual arrows per (source, target) pair.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def decision_surface(clf_fn, xlim=(0.0, 1.0), ylim=(0.0, 1.0), res: int = 300):
    xs = np.linspace(*xlim, res)
    ys = np.linspace(*ylim, res)
    gx, gy = np.meshgrid(xs, ys)
    grid = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=1), jnp.float32)
    preds = np.asarray(jnp.argmax(clf_fn(grid), axis=1)).reshape(res, res)
    return xs, ys, preds


def plot_decision_boundaries_and_cfs(
    clf_fn,
    cf_fn,
    g_vars,
    x,
    y,
    num_classes: int,
    out_dir: str,
    mask_row=None,
    n_cf_samples: int = 20,
    key=None,
    save_prefix: str = "decision_boundaries_cfs",
):
    """One PNG per (source, target) pair with arrows original -> CF."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    x = np.asarray(x)
    y = np.asarray(y)
    xs, ys, surface = decision_surface(clf_fn)
    key = key if key is not None else jax.random.key(0)

    paths = []
    for src in range(num_classes):
        for tgt in range(num_classes):
            if src == tgt:
                continue
            sel = np.where(y == src)[0][:n_cf_samples]
            if not len(sel):
                continue
            xb = jnp.asarray(x[sel])
            tvec = jnp.full((len(sel),), tgt, jnp.int32)
            if mask_row is None:
                mask = jnp.ones_like(xb)
            else:
                mask = jnp.broadcast_to(jnp.asarray(mask_row, jnp.float32), xb.shape)
            x_cf, _, _ = cf_fn(g_vars, xb, tvec, mask, key)
            x_cf = np.asarray(x_cf)

            fig, ax = plt.subplots(figsize=(6, 5))
            ax.contourf(xs, ys, surface, alpha=0.25, cmap="viridis",
                        levels=np.arange(num_classes + 1) - 0.5)
            ax.scatter(x[:, 0], x[:, 1], c=y, s=6, cmap="viridis", alpha=0.35)
            for a, b in zip(x[sel], x_cf):
                ax.annotate(
                    "", xy=b, xytext=a,
                    arrowprops=dict(arrowstyle="->", color="red", lw=1.2),
                )
            ax.scatter(x_cf[:, 0], x_cf[:, 1], c="red", s=18, marker="x")
            ax.set_title(f"Counterfactuals {src} -> {tgt}")
            p = os.path.join(out_dir, f"{save_prefix}_src{src}_tgt{tgt}.png")
            fig.tight_layout()
            fig.savefig(p, dpi=120)
            plt.close(fig)
            paths.append(p)
    return paths


def plot_decision_boundaries_only(clf_fn, x, y, out_path: str,
                                  num_classes: int = 3, highlight=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    xs, ys, surface = decision_surface(clf_fn)
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.contourf(xs, ys, surface, alpha=0.3, cmap="viridis",
                levels=np.arange(num_classes + 1) - 0.5)
    ax.scatter(np.asarray(x)[:, 0], np.asarray(x)[:, 1], c=np.asarray(y), s=6,
               cmap="viridis")
    if highlight is not None:
        h = np.asarray(highlight)
        ax.scatter([h[0]], [h[1]], marker="*", s=220, c="red",
                   edgecolors="black", zorder=5)
    ax.set_title("Decision boundaries")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
