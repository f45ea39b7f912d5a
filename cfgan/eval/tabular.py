"""Tabular counterfactual analysis suite (KC-house pipeline).

Rebuilds the reference's 728-line `house_sales_kc_usa/eval_utils.py` the
TPU way: ONE jitted vmap-over-targets counterfactual sweep produces a
(num_targets, B, D) tensor, and every report — per-target metrics, feature
shift importance (`eval_utils.py:292-348`), class-pair sensitivity heatmaps
(:351-434), and the case-study CSV tree (:496-664) — is a pandas view over
that single device computation, instead of re-running the generator per
report.

The eval-time counterfactual uses hard Gumbel sampling and the
immutable-only mask, and clamps to [0, 1] data space
(`eval_utils.py:49-51,74-77,126`); the training-time un-clamped variant at
:244-245 is a reference defect (SURVEY.md section 2.11) and not reproduced.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cfgan.core.config import TabularSchema
from cfgan.data.transforms import NormStats


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def immutable_mask(batch: int, schema: TabularSchema) -> jnp.ndarray:
    """All-ones mask with immutable features forced to 0
    (`eval_utils.py:49-51`)."""
    from cfgan.masks.feature import immutable_complement_mask

    return immutable_complement_mask(batch, schema.input_dim,
                                     schema.immutable_idx)


def make_protocol_flip_scorer(cf_fn, clf_fn, num_classes: int):
    """Jitted per-target flip rates under BOTH eval protocols at once.

    Returns `score(g_vars, x, y, mask, keys)` -> `(honest, ref)`, each of
    shape (K, C): honest = flips of the clamped counterfactual (this
    framework's headline), ref = flips of the UN-clamped `x + masked`
    the reference's eval scores (`house eval_utils.py:244-245`), per
    Gumbel eval key in `keys` (vmapped — average over keys to shrink the
    sampling noise that round-4's single-key selection was exposed to).
    Used by the snapshot-selection stage of the house experiment main and
    by tools/house_ladder_matrix.py."""

    @jax.jit
    def score(g_vars, x, y, mask, keys):
        def one_key(key):
            def one_t(t):
                tvec = jnp.full((x.shape[0],), t, jnp.int32)
                x_cf, raw, masked = cf_fn(g_vars, x, tvec, mask, key)
                x_ref = x + masked
                ph = jnp.argmax(clf_fn(x_cf), 1)
                pr = jnp.argmax(clf_fn(x_ref), 1)
                sel = y != t
                n = jnp.sum(sel)
                return (jnp.sum((ph == t) & sel) / n,
                        jnp.sum((pr == t) & sel) / n)

            return jax.vmap(one_t)(jnp.arange(num_classes))

        fh, fr = jax.vmap(one_key)(keys)
        return fh, fr

    return score


@functools.lru_cache(maxsize=64)
def _make_sweep(cf_fn, clf_fn, num_classes: int):
    """Compiled all-target sweep, cached per (cf_fn, clf_fn) pair so repeat
    callers (mask-policy analysis runs it once per policy) reuse one
    executable instead of re-tracing."""

    @jax.jit
    def _sweep(g_vars, x, mask, key):
        def one(t):
            tvec = jnp.full((x.shape[0],), t, jnp.int32)
            x_cf, raw, masked = cf_fn(g_vars, x, tvec, mask, key)
            logits = clf_fn(x_cf)
            return x_cf, jnp.argmax(logits, 1), jax.nn.softmax(logits, 1)

        x_cf, preds, probs = jax.vmap(one)(jnp.arange(num_classes))
        probs_orig = jax.nn.softmax(clf_fn(x), 1)
        return x_cf, preds, probs, probs_orig

    return _sweep


def sweep_all_targets(cf_fn, clf_fn, g_vars, x, mask, num_classes: int, key):
    """One fused call: counterfactuals + classifier outputs for EVERY target.

    Returns dict of numpy arrays:
      x_cf (C,B,D), preds_cf (C,B), probs_cf (C,B,C), probs_orig (B,C).
    """
    x = jnp.asarray(x)
    mask = jnp.asarray(mask)
    x_cf, preds, probs, probs_orig = _make_sweep(cf_fn, clf_fn, num_classes)(
        g_vars, x, mask, key
    )
    return {
        "x_cf": np.asarray(x_cf),
        "preds_cf": np.asarray(preds),
        "probs_cf": np.asarray(probs),
        "probs_orig": np.asarray(probs_orig),
    }


def per_target_metrics_from_sweep(sweep: dict, x, y,
                                  num_classes: int) -> pd.DataFrame:
    """flip rate / prediction gain / actionability per target, samples with
    y == target excluded (`eval_utils.py:185-289`)."""
    x = np.asarray(x)
    y = np.asarray(y)
    rows = []
    for t in range(num_classes):
        sel = y != t
        if not sel.any():
            rows.append((t, np.nan, np.nan, np.nan))
            continue
        preds = sweep["preds_cf"][t][sel]
        delta = sweep["x_cf"][t][sel] - x[sel]
        gain = (sweep["probs_cf"][t][sel, t]
                - sweep["probs_orig"][sel, t])
        rows.append((
            t,
            float((preds == t).mean()),
            float(gain.mean()),
            float(np.abs(delta).mean()),
        ))
    return pd.DataFrame(
        rows, columns=["target_class", "class_flip_rate", "prediction_gain",
                       "avg_actionability"],
    )


def feature_shift_importance(
    sweep: dict, x, y, schema: TabularSchema, stats: NormStats,
    out_dir: str | None = None,
) -> pd.DataFrame:
    """Global mean |delta| per feature over all (sample, target != y) pairs,
    both normalized and in raw units (`eval_utils.py:292-348`)."""
    x = np.asarray(x)
    y = np.asarray(y)
    C = sweep["x_cf"].shape[0]
    deltas = []
    for t in range(C):
        sel = y != t
        deltas.append(np.abs(sweep["x_cf"][t][sel] - x[sel]))
    d = np.concatenate(deltas, axis=0)  # (sum_B, D)
    mean_norm = d.mean(axis=0)
    mean_raw = mean_norm * np.asarray(stats.data_range)
    df = pd.DataFrame({
        "feature": schema.feature_names,
        "mean_abs_shift_normalized": mean_norm,
        "mean_abs_shift_raw": mean_raw,
    }).sort_values("mean_abs_shift_normalized", ascending=False)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        df.to_csv(os.path.join(out_dir, "feature_shift_importance.csv"),
                  index=False)
        plt = _mpl()
        fig, axes = plt.subplots(1, 2, figsize=(12, 6))
        for ax, col, title in (
            (axes[0], "mean_abs_shift_normalized", "normalized"),
            (axes[1], "mean_abs_shift_raw", "raw units"),
        ):
            sub = df.iloc[::-1]
            ax.barh(sub["feature"], sub[col])
            ax.set_title(f"Mean |shift| ({title})")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "feature_shift_importance.png"),
                    dpi=120)
        plt.close(fig)
    return df


def class_pair_sensitivity(
    sweep: dict, x, y, schema: TabularSchema,
    out_dir: str | None = None,
) -> pd.DataFrame:
    """Mean |delta| per feature for each (source, target) pair; one heatmap
    per source class (`eval_utils.py:351-434`)."""
    x = np.asarray(x)
    y = np.asarray(y)
    C = sweep["x_cf"].shape[0]
    records = []
    for s in range(C):
        for t in range(C):
            if s == t:
                continue
            sel = y == s
            if not sel.any():
                continue
            d = np.abs(sweep["x_cf"][t][sel] - x[sel]).mean(axis=0)
            for f, v in zip(schema.feature_names, d):
                records.append({"source": s, "target": t, "feature": f,
                                "mean_abs_shift": float(v)})
    df = pd.DataFrame(records)

    if out_dir and len(df):
        pair_dir = os.path.join(out_dir, "class_pair_sensitivity")
        os.makedirs(pair_dir, exist_ok=True)
        df.to_csv(os.path.join(pair_dir, "class_pair_sensitivity.csv"),
                  index=False)
        plt = _mpl()
        for s in sorted(df["source"].unique()):
            pivot = df[df["source"] == s].pivot(
                index="feature", columns="target", values="mean_abs_shift"
            ).reindex(schema.feature_names)
            fig, ax = plt.subplots(figsize=(6, 7))
            im = ax.imshow(pivot.values, cmap="viridis", aspect="auto")
            ax.set_yticks(range(len(pivot.index)), pivot.index, fontsize=8)
            ax.set_xticks(range(len(pivot.columns)),
                          [str(c) for c in pivot.columns])
            ax.set_xlabel("target class")
            ax.set_title(f"Mean |shift| from source class {s}")
            fig.colorbar(im)
            fig.tight_layout()
            fig.savefig(os.path.join(pair_dir, f"src{s}.png"), dpi=120)
            plt.close(fig)
    return df


def case_study_report(
    sweep: dict, x, y, schema: TabularSchema, stats: NormStats,
    out_dir: str, n_samples: int = 20, seed: int = 0,
    change_threshold: float = 1e-3, top_k: int = 5,
) -> pd.DataFrame:
    """Per-sample case-study CSV tree (`eval_utils.py:496-664`):
    samples/src{S}_tgt{T}/sample_{i}.csv with per-feature original /
    counterfactual values in raw units, plus sample-, feature- and
    aggregate-level summaries."""
    x = np.asarray(x)
    y = np.asarray(y)
    rng = np.random.RandomState(seed)
    C = sweep["x_cf"].shape[0]
    idx = rng.choice(len(y), size=min(n_samples, len(y)), replace=False)

    os.makedirs(out_dir, exist_ok=True)
    data_min = np.asarray(stats.data_min)
    data_rng = np.asarray(stats.data_range)
    sample_rows, feat_changes = [], []
    for i in idx:
        s = int(y[i])
        t = int(rng.choice([c for c in range(C) if c != s]))
        orig_n, cf_n = x[i], sweep["x_cf"][t, i]
        orig_raw = orig_n * data_rng + data_min
        cf_raw = cf_n * data_rng + data_min
        delta_n = cf_n - orig_n
        changed = np.abs(delta_n) > change_threshold
        df_s = pd.DataFrame({
            "feature": schema.feature_names,
            "original": orig_raw,
            "counterfactual": cf_raw,
            "change": cf_raw - orig_raw,
            "abs_delta_normalized": np.abs(delta_n),
            "changed": changed,
            "immutable": [f in schema.immutable_features
                          for f in schema.feature_names],
        })
        sdir = os.path.join(out_dir, "samples", f"src{s}_tgt{t}")
        os.makedirs(sdir, exist_ok=True)
        df_s.to_csv(os.path.join(sdir, f"sample_{i}.csv"), index=False)

        flipped = int(sweep["preds_cf"][t, i] == t)
        top = df_s.nlargest(top_k, "abs_delta_normalized")["feature"].tolist()
        sample_rows.append({
            "sample": int(i), "source": s, "target": t, "flipped": flipped,
            "n_changed": int(changed.sum()),
            "frac_changed": float(changed.mean()),
            "sparsity": float(1.0 - changed.mean()),
            "l1_normalized": float(np.abs(delta_n).sum()),
            "top_changed": ";".join(top),
        })
        for f, dn in zip(schema.feature_names, np.abs(delta_n)):
            feat_changes.append({"feature": f, "abs_delta_normalized": dn})

    sample_df = pd.DataFrame(sample_rows)
    sample_df.to_csv(os.path.join(out_dir, "case_study_sample_summary.csv"),
                     index=False)
    feat_df = (
        pd.DataFrame(feat_changes).groupby("feature").mean()
        .reindex(schema.feature_names).reset_index()
    )
    feat_df["pct_of_range"] = 100.0 * feat_df["abs_delta_normalized"]
    feat_df.to_csv(os.path.join(out_dir, "case_study_feature_summary.csv"),
                   index=False)
    agg = pd.DataFrame([{
        "n_samples": len(sample_df),
        "flip_rate": sample_df["flipped"].mean(),
        "mean_sparsity": sample_df["sparsity"].mean(),
        "mean_frac_changed": sample_df["frac_changed"].mean(),
        "top_features": ";".join(
            feat_df.nlargest(top_k, "pct_of_range")["feature"]
        ),
    }])
    agg.to_csv(os.path.join(out_dir, "case_study_aggregate_summary.csv"),
               index=False)
    return sample_df
