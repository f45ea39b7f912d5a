"""Bring YOUR OWN tabular dataset to cfgan — end-to-end example.

The reference hardwires its three datasets into per-folder scripts; cfgan
is a framework: a new dataset is a `TabularSchema` (feature names,
immutables, categorical value sets) plus arrays.  This example builds a
synthetic credit-risk dataset from scratch and runs the full promptable
counterfactual stack on it:

  1. schema + MinMax stats (fit on train only) — built by hand here to
     show every field; `TabularSchema.from_dataframe(df, immutable=...,
     exclude=...)` infers one from a pandas DataFrame in one line
  2. classifier pretraining (weighted CE, plateau LR)
  3. CounteRGAN training (FiLM generator with Gumbel-Softmax categorical
     heads, spectral-norm WGAN discriminator, 4-term loss) — the same
     fused/scanned TPU path the kc_house pipeline uses
  4. vmapped all-target evaluation (flip rate / prediction gain /
     actionability)
  5. promptable serving: natural-language feature masks by name through
     `CounterfactualEngine` ("what should I change, if my savings and debt
     are negotiable, to be low-risk?")

Runs in ~1 min on CPU:  python examples/custom_tabular.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

# allow running straight from a checkout (pip install -e . also works)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_credit_dataset(n: int = 4000, seed: int = 7):
    """Synthetic 3-class credit-risk table with a learnable rule."""
    rng = np.random.RandomState(seed)
    income = rng.lognormal(10.6, 0.5, n)  # yearly
    age = rng.uniform(21, 75, n).round()
    debt_ratio = rng.beta(2, 5, n)
    late_payments = rng.choice([0, 1, 2, 3, 4, 5], n,
                               p=[0.5, 0.2, 0.12, 0.08, 0.06, 0.04])
    num_accounts = rng.choice(range(1, 11), n)
    has_mortgage = (rng.uniform(0, 1, n) < 0.4).astype(float)
    savings = rng.lognormal(8.5, 1.2, n)
    score = (
        0.9 * (income / 60_000)
        + 0.6 * (savings / 20_000)
        - 1.6 * debt_ratio
        - 0.45 * late_payments
        + 0.3 * has_mortgage
        + rng.normal(0, 0.35, n)
    )
    y = np.digitize(score, np.quantile(score, [1 / 3, 2 / 3]))  # 0=high risk
    x = np.stack([income, age, debt_ratio, late_payments.astype(float),
                  num_accounts.astype(float), has_mortgage, savings], 1)
    return x.astype(np.float32), y.astype(np.int32)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # example stays CPU-friendly
    import jax.numpy as jnp

    from cfgan.core.config import ClassifierConfig, CounterGANConfig, TabularSchema
    from cfgan.data.transforms import fit_minmax
    from cfgan.eval.tabular import (
        immutable_mask,
        per_target_metrics_from_sweep,
        sweep_all_targets,
    )
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.serve.engine import CounterfactualEngine
    from cfgan.train.builders import build_tabular_countergan
    from cfgan.train.classifier import make_eval_fn, train_classifier
    from cfgan.train.loop import train_countergan_loop

    # ---- 1. schema: names, what may not change, what is discrete ----
    schema = TabularSchema(
        feature_names=("income", "age", "debt_ratio", "late_payments",
                       "num_accounts", "has_mortgage", "savings"),
        immutable_features=("age",),  # counterfactuals may not change age
        categorical_values={
            "late_payments": (0.0, 1.0, 2.0, 3.0, 4.0, 5.0),
            "num_accounts": tuple(float(v) for v in range(1, 11)),
            "has_mortgage": (0.0, 1.0),
        },
    )
    x, y = make_credit_dataset()
    n_train = int(0.8 * len(y))
    xtr_raw, ytr = x[:n_train], y[:n_train]
    xte_raw, yte = x[n_train:], y[n_train:]
    stats = fit_minmax(xtr_raw)  # fit on train ONLY; travels with ckpts
    xtr = np.asarray(stats.transform(xtr_raw), np.float32)
    xte = np.asarray(stats.transform(xte_raw), np.float32)

    # ---- 2. classifier ----
    clf_model = TabularClassifier(num_classes=3)
    clf_state, hist = train_classifier(
        clf_model,
        ClassifierConfig(arch="tabular", lr=1e-3, epochs=30, batch_size=128,
                         class_weighted=True),
        (xtr, ytr), valid_set=(xte, yte), seed=0,
    )
    logits_fn, accuracy = make_eval_fn(clf_model)
    print(f"classifier test accuracy: {accuracy(clf_state, xte, yte):.3f}")

    # ---- 3. CounteRGAN ----
    cfg = CounterGANConfig(
        epochs=30, lr_g=1e-3, lr_d=1e-3, lambda_cls=2.0, lambda_reg_l1=1.0,
        lambda_mask=1.0, adv_loss="wasserstein",
        reg_reduction="per_sample_norm", clamp_cf=(0.0, 1.0),
        resample_target=True, hidden_dim=32, num_res_blocks=3,
        gumbel_tau=0.5,
    )
    bundle = build_tabular_countergan(cfg, clf_model, clf_state, schema,
                                      stats, num_classes=3, seed=0)
    state, _ = train_countergan_loop(bundle, xtr, ytr, epochs=cfg.epochs,
                                     batch_size=128, seed=0, log_every=10)

    # ---- 4. evaluation: one vmapped program for all targets ----
    g_vars = state.g.variables()
    mask = immutable_mask(len(yte), schema)
    sweep = sweep_all_targets(
        bundle.cf_fn, lambda xx: logits_fn(clf_state.params, clf_state.stats, xx),
        g_vars, jnp.asarray(xte), mask, 3, jax.random.key(1),
    )
    print(per_target_metrics_from_sweep(sweep, xte, yte, 3))

    # ---- 5. promptable serving with a natural-language-ish mask ----
    engine = CounterfactualEngine.from_bundle(
        bundle, clf_model, clf_state, state=state, schema=schema,
        stats=stats,
    )
    sample = xte[yte == 0][:1]  # one high-risk applicant
    allowed = ["savings", "debt_ratio", "late_payments"]  # negotiables
    res = engine.generate(
        sample, target=2, mask=engine.mask_from_feature_names(allowed, 1),
    )
    cf_raw = np.asarray(stats.inverse_transform(res.x_cf))[0]
    orig_raw = np.asarray(stats.inverse_transform(sample))[0]
    print(f"\nhigh-risk -> low-risk counterfactual "
          f"(flipped={bool(res.flipped[0])}, "
          f"confidence={float(res.confidence[0]):.2f}):")
    for i, name in enumerate(schema.feature_names):
        if abs(cf_raw[i] - orig_raw[i]) > 1e-6:
            print(f"  {name}: {orig_raw[i]:,.2f} -> {cf_raw[i]:,.2f}")
    changed = {schema.feature_names[i]
               for i in range(len(orig_raw))
               if abs(cf_raw[i] - orig_raw[i]) > 1e-6}
    assert changed <= set(allowed), (
        f"counterfactual touched non-allowed features: {changed - set(allowed)}")
    print("(only the allowed features changed — mask respected)")


if __name__ == "__main__":
    main()
