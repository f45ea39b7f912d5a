"""Classifier evaluation: accuracy, confusion matrix, classification report.

Covers `mnist/eval_utils.py:15-43` (acc + seaborn confusion heatmap),
`house eval_utils.py:436-493` (acc/precision/recall/F1 + PNG + text report),
`moons/eval_utils.py:10-26` (confusion CSV).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pandas as pd
from sklearn.metrics import classification_report, confusion_matrix


def predict_all(logits_fn, params, stats, x, batch: int = 4096) -> np.ndarray:
    preds = []
    x = np.asarray(x)
    for lo in range(0, len(x), batch):
        lg = logits_fn(params, stats, jnp.asarray(x[lo : lo + batch]))
        preds.append(np.asarray(jnp.argmax(lg, axis=1)))
    return np.concatenate(preds)


def evaluate_classifier(
    logits_fn,
    state,
    x,
    y,
    out_dir: str | None = None,
    class_names=None,
    title: str = "Confusion Matrix",
):
    """Returns dict(accuracy, report, confusion); writes PNG/CSV/TXT when
    out_dir is given."""
    y = np.asarray(y)
    preds = predict_all(logits_fn, state.params, state.stats, x)
    acc = float((preds == y).mean())
    cm = confusion_matrix(y, preds)
    report = classification_report(y, preds, output_dict=True, zero_division=0)

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        pd.DataFrame(cm).to_csv(os.path.join(out_dir, "confusion_matrix.csv"))
        with open(os.path.join(out_dir, "classifier_report.txt"), "w") as f:
            f.write(f"accuracy: {acc:.4f}\n")
            f.write(
                f"weighted_f1: {report['weighted avg']['f1-score']:.4f}\n\n"
            )
            f.write(classification_report(y, preds, zero_division=0))
        _plot_confusion(cm, os.path.join(out_dir, "confusion_matrix.png"),
                        class_names, title)
    return {"accuracy": acc, "report": report, "confusion": cm}


def _plot_confusion(cm, path, class_names=None, title="Confusion Matrix"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(cm, cmap="Blues")
    n = cm.shape[0]
    names = class_names or list(range(n))
    ax.set_xticks(range(n), names)
    ax.set_yticks(range(n), names)
    for i in range(n):
        for j in range(n):
            ax.text(j, i, str(cm[i, j]), ha="center", va="center",
                    color="white" if cm[i, j] > cm.max() / 2 else "black",
                    fontsize=8)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ax.set_title(title)
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
