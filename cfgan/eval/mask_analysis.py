"""Tabular mask-policy analysis.

The reference optionally imports an `eval_utils_mask_analysis` module that is
absent from its repo (`house eval_utils.py:19-22` — the import is wrapped in
try/except and silently skipped).  This is the real implementation: quantify
how counterfactual quality degrades as the modifiable-feature budget shrinks.

Policies analyzed:
* `all_mutable`   — every non-immutable feature modifiable (the eval default);
* `random_half`   — iid Bernoulli(0.5) over mutable features (the training
                    distribution, `house trainer.py:253-255`);
* `single:<name>` — exactly one feature modifiable, for every mutable
                    feature (ranks per-feature counterfactual power);
* `top{k}`        — only the k globally most-shifted features modifiable.

All masks feed the same compiled all-target sweep; results are one tidy
DataFrame (policy x target metrics).
"""
from __future__ import annotations

import os

import jax
import numpy as np
import pandas as pd

from cfgan.core.config import TabularSchema
from cfgan.eval.tabular import (
    immutable_mask,
    per_target_metrics_from_sweep,
    sweep_all_targets,
)


def _mask_from_idx(batch: int, dim: int, idx) -> np.ndarray:
    m = np.zeros((batch, dim), np.float32)
    if len(idx):
        m[:, list(idx)] = 1.0
    return m


def analyze_mask_policies(
    cf_fn,
    clf_fn,
    g_vars,
    x,
    y,
    schema: TabularSchema,
    num_classes: int,
    key=None,
    out_dir: str | None = None,
    top_k: int = 5,
    max_samples: int = 1024,
    seed: int = 0,
) -> pd.DataFrame:
    """Returns a DataFrame with columns [policy, n_modifiable, target_class,
    class_flip_rate, prediction_gain, avg_actionability]."""
    x = np.asarray(x)[:max_samples]
    y = np.asarray(y)[:max_samples]
    b, d = x.shape
    key = key if key is not None else jax.random.key(seed)
    mutable = [i for i in range(d) if i not in schema.immutable_idx]
    rng = np.random.RandomState(seed)

    rh = (rng.uniform(0, 1, (b, d)) > 0.5).astype(np.float32)
    rh[:, list(schema.immutable_idx)] = 0.0
    policies: dict[str, np.ndarray] = {
        "all_mutable": np.asarray(immutable_mask(b, schema)),
        "random_half": rh,
    }
    for i in mutable:
        policies[f"single:{schema.feature_names[i]}"] = _mask_from_idx(
            b, d, [i]
        )

    rows = []
    shifts = None
    for name, mask in policies.items():
        sweep = sweep_all_targets(cf_fn, clf_fn, g_vars, x, mask,
                                  num_classes, key)
        df = per_target_metrics_from_sweep(sweep, x, y, num_classes)
        df.insert(0, "policy", name)
        df.insert(1, "n_modifiable", int(mask[0].sum()))
        rows.append(df)
        if name == "all_mutable":
            deltas = np.concatenate(
                [np.abs(sweep["x_cf"][t] - x) for t in range(num_classes)], 0
            )
            shifts = deltas.mean(axis=0)

    # top-k policy from the measured global shifts
    order = np.argsort(-shifts)
    top_idx = [i for i in order if i in mutable][:top_k]
    mask = _mask_from_idx(b, d, top_idx)
    sweep = sweep_all_targets(cf_fn, clf_fn, g_vars, x, mask, num_classes, key)
    df = per_target_metrics_from_sweep(sweep, x, y, num_classes)
    df.insert(0, "policy",
              f"top{top_k}:" + "+".join(schema.feature_names[i]
                                        for i in top_idx))
    df.insert(1, "n_modifiable", top_k)
    rows.append(df)

    out = pd.concat(rows, ignore_index=True)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        out.to_csv(os.path.join(out_dir, "mask_policy_analysis.csv"),
                   index=False)
        _plot(out, os.path.join(out_dir, "mask_policy_analysis.png"))
    return out


def _plot(df: pd.DataFrame, path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    agg = df.groupby("policy").agg(
        flip=("class_flip_rate", "mean"), n=("n_modifiable", "first")
    ).sort_values("flip")
    fig, ax = plt.subplots(figsize=(7, max(3, 0.3 * len(agg))))
    ax.barh(agg.index, agg["flip"])
    ax.set_xlabel("mean flip rate across targets")
    ax.set_title("Counterfactual flip rate by mask policy")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def patch_budget_curve(
    cf_fn,
    clf_fn,
    g_vars,
    x,
    y,
    num_classes: int,
    patch_size: int,
    budgets=None,
    key=None,
    out_dir: str | None = None,
    max_samples: int = 512,
    seed: int = 0,
) -> "pd.DataFrame":
    """Image analog of the mask-policy analysis: counterfactual quality as a
    function of the modifiable-patch budget (1..all patches, random masks at
    each budget).  Quantifies how much freedom the generator needs — the
    image-side question the reference's masked metrics only sample at one
    budget (`mnist/eval_utils.py:292-344`)."""
    import jax.numpy as jnp

    from cfgan.masks.patch import patch_grid_dims, random_patch_mask

    x = np.asarray(x)[:max_samples]
    y = np.asarray(y)[:max_samples]
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    ph, pw = patch_grid_dims(h, w, patch_size)
    total = ph * pw
    budgets = budgets or sorted({1, 2, 4, 6, 8, 10, 12, total})
    key = key if key is not None else jax.random.key(seed)
    rng_t = np.random.RandomState(seed)
    t = jnp.asarray(rng_t.randint(0, num_classes, b))

    rows = []
    xj = jnp.asarray(x)
    for k_i, budget in enumerate(budgets):
        mask = random_patch_mask(jax.random.fold_in(key, k_i), b, (h, w),
                                 patch_size, budget, channels=x.shape[-1])
        x_cf, raw, masked = cf_fn(g_vars, xj, t, mask, key)
        logits = clf_fn(x_cf)
        preds = np.asarray(jnp.argmax(logits, 1))
        probs = np.asarray(jax.nn.softmax(logits, 1))
        rows.append({
            "n_patches": int(budget),
            "frac_area": budget / total,
            "flip_rate": float((preds == np.asarray(t)).mean()),
            "mean_target_prob": float(probs[np.arange(b), np.asarray(t)].mean()),
            "actionability": float(np.abs(np.asarray(x_cf) - x).mean()),
        })
    df = pd.DataFrame(rows)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        df.to_csv(os.path.join(out_dir, "patch_budget_curve.csv"), index=False)
        plt = __import__("matplotlib.pyplot", fromlist=["pyplot"])
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(df["n_patches"], df["flip_rate"], marker="o", label="flip rate")
        ax.plot(df["n_patches"], df["mean_target_prob"], marker="s",
                label="mean target prob")
        ax.set_xlabel(f"modifiable {patch_size}x{patch_size} patches")
        ax.set_ylim(0, 1.05)
        ax.legend()
        ax.set_title("Counterfactual success vs patch budget")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "patch_budget_curve.png"), dpi=120)
        plt.close(fig)
    return df
