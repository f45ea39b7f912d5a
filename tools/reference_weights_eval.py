"""Reproduce the reference's committed eval numbers by running ITS OWN
trained weights through cfgan's models + eval stack.

This is the strongest functional-parity instrument available: no training
chaos is involved — the reference's committed checkpoints
(`house_sales_kc_usa/{generator_model,clf_model}.pt`) are imported via
`cfgan.migrate`, the REAL kc_house CSV is split with the same seed-42
sklearn split the reference uses (`house data_utils.py:35`), and cfgan's
vmapped all-target sweep + per-target metrics (`cfgan/eval/tabular.py`,
rebuilding `house eval_utils.py:185-289`) are compared against the
reference's committed `results/countergan_metrics.csv`.  If cfgan's
generator/classifier forward passes and eval protocol are functionally
identical to the reference's, the numbers must agree up to the hard-Gumbel
sampling noise of the categorical heads (the one nondeterministic input).

Both protocols are reported:
  - reference protocol: x_cf = x + masked_residual, UN-clamped
    (`house eval_utils.py:244-245` discards the clamped CF — the committed
    CSV was produced this way)
  - honest protocol: x_cf clamped to [0,1] data space

The moons leg does the same with `moons/results/{generator,classifier}.pt`
on bit-identically regenerated data (`moons/data_utils.py:7-22` is fully
seeded): the classifier confusion matrix must match the committed
`classifier_confusion.csv` EXACTLY (deterministic forward), and the
CF metrics (deterministic too — no Gumbel in the moons generator) are
compared against the committed `metrics.csv` / `metrics_all_masks.csv`
"both" row, whose values differ from each other by up to ~3% (two
reference runs), which bounds the meaningful tolerance.

Usage: python tools/reference_weights_eval.py
           [--out results/reference_weights_eval] [--legs house,moons]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/conditional_counteRGAN/house_sales_kc_usa"
REF_COMMITTED = {  # results/countergan_metrics.csv:2-5
    "class_flip_rate": [0.9999999824692222, 0.9906153240624596,
                        0.9796906499301686, 0.995971225640353],
    "prediction_gain": [0.9074525955845328, 0.6049661653883317,
                        0.5696628865073708, 0.9036681161207312],
    "avg_actionability": [0.05274696680991089, 0.04624097169760395,
                          0.05372137729735935, 0.059160224545527905],
}


REF_MOONS = "/root/reference/conditional_counteRGAN/moons/results"
# moons/results/classifier_confusion.csv (rows true_0..2 x pred_0..2)
REF_MOONS_CONFUSION = [[73, 0, 0], [1, 86, 0], [0, 0, 80]]
# moons/results/metrics_all_masks.csv "both" rows — produced by the SAME
# committed generator.pt (cfgan's deterministic forward of the imported
# weights reproduces these to <=3e-8, the f32 accumulation floor; the also-
# committed metrics.csv differs from this file by up to 3% and is evidently
# an earlier checkpoint's run)
REF_MOONS_METRICS = {
    "class_flip": [1.0, 1.0, 0.9999999701976776],
    "prediction_gain": [0.9920655339956284, 0.9999754279851913,
                        0.9908419996500015],
    "avg_actionability": [0.16128670424222946, 0.2711535766720772,
                          0.16942739114165306],
}


def _ref_batch_agg(vals, y, t, bs=64):
    """The reference's aggregation: mean over per-batch means of fixed
    64-sample test slices, skipping batches with no y != t samples
    (`moons/eval_utils.py:52-100`)."""
    import numpy as np

    means = []
    for lo in range(0, len(y), bs):
        sel = y[lo:lo + bs] != t
        if sel.any():
            means.append(float(vals[lo:lo + bs][sel].mean()))
    return float(np.mean(means))


def run_moons(out_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd
    from sklearn.metrics import confusion_matrix

    from cfgan import migrate
    from cfgan.data.moons import load_moons3
    from cfgan.models.classifiers import MLPClassifier
    from cfgan.models.generators import MoonsResidualGenerator

    (xtr, ytr), (xte, yte), stats = load_moons3()
    clf_model = MLPClassifier()
    clf_tpl = clf_model.init(jax.random.key(0), jnp.zeros((2, 2)))
    clf_vars = migrate.validate_against(
        migrate.import_moons_classifier(f"{REF_MOONS}/classifier.pt"),
        {"params": clf_tpl["params"]}, "moons clf")
    g_model = MoonsResidualGenerator()
    g_tpl = g_model.init(jax.random.key(0), jnp.zeros((2, 2)),
                         jnp.zeros((2, 3)), jnp.ones((2, 2)), train=False)
    g_vars = migrate.validate_against(
        migrate.import_moons_generator(f"{REF_MOONS}/generator.pt"),
        {k: g_tpl[k] for k in ("params", "batch_stats")}, "moons G")

    x = jnp.asarray(xte)
    preds = np.asarray(jnp.argmax(clf_model.apply(clf_vars, x), 1))
    cm = confusion_matrix(np.asarray(yte), preds)
    exact = (cm == np.asarray(REF_MOONS_CONFUSION)).all()
    print(f"moons confusion matrix (imported classifier):\n{cm}\n"
          f"matches committed classifier_confusion.csv EXACTLY: {exact}")

    mask = jnp.ones_like(x)
    rows = []
    for t in range(3):
        oh = jax.nn.one_hot(jnp.full((len(yte),), t), 3)
        _, masked = g_model.apply(g_vars, x, oh, mask, train=False)
        cf = x + masked  # moons eval has no clamp (`eval_utils.py:78`)
        lg_cf = clf_model.apply(clf_vars, cf)
        lg_o = clf_model.apply(clf_vars, x)
        p_cf = jax.nn.softmax(lg_cf, -1)[:, t]
        p_o = jax.nn.softmax(lg_o, -1)[:, t]
        y = np.asarray(yte)
        flips = np.asarray(jnp.argmax(lg_cf, 1) == t, np.float64)
        gains = np.asarray(p_cf - p_o, np.float64)
        acts = np.asarray(jnp.abs(masked).mean(1), np.float64)
        rows.append({
            "target_class": t,
            "class_flip": _ref_batch_agg(flips, y, t),
            "prediction_gain": _ref_batch_agg(gains, y, t),
            "avg_actionability": _ref_batch_agg(acts, y, t),
        })
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(out_dir, "moons_metrics.csv"), index=False)
    print("\nmoons CF metrics on the imported generator vs the committed "
          "metrics_all_masks.csv 'both' rows (same checkpoint):")
    max_delta = 0.0
    for t in range(3):
        deltas = [abs(df.class_flip[t] - REF_MOONS_METRICS["class_flip"][t]),
                  abs(df.prediction_gain[t]
                      - REF_MOONS_METRICS["prediction_gain"][t]),
                  abs(df.avg_actionability[t]
                      - REF_MOONS_METRICS["avg_actionability"][t])]
        max_delta = max(max_delta, *deltas)
        print(f"  target {t}: flip {df.class_flip[t]:.7f} vs "
              f"{REF_MOONS_METRICS['class_flip'][t]:.7f} | gain "
              f"{df.prediction_gain[t]:.7f} vs "
              f"{REF_MOONS_METRICS['prediction_gain'][t]:.7f} | action "
              f"{df.avg_actionability[t]:.7f} vs "
              f"{REF_MOONS_METRICS['avg_actionability'][t]:.7f}")
    print(f"  max |delta| over all 9 metrics: {max_delta:.2e} "
          f"(f32 accumulation floor)")
    return {"confusion_exact": bool(exact),
            "confusion": cm.tolist(),
            "max_metric_delta": max_delta,
            "metrics": df.to_dict("records")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/reference_weights_eval")
    ap.add_argument("--seed", type=int, default=0,
                    help="Gumbel sampling seed for the categorical heads")
    ap.add_argument("--legs", default="house,moons")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from cfgan import migrate
    from cfgan.core.config import CounterGANConfig
    from cfgan.data.kc_house import load_kc_house
    from cfgan.eval.classifier import evaluate_classifier
    from cfgan.eval.tabular import (
        immutable_mask,
        per_target_metrics_from_sweep,
        sweep_all_targets,
    )
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.models.generators import TabularResidualGenerator
    from cfgan.train.builders import build_tabular_countergan
    from cfgan.train.classifier import make_eval_fn
    from cfgan.train.state import NetState, adam_like_torch

    if not os.path.exists(f"{REF}/generator_model.pt"):
        print("reference checkpoints not available; nothing to do")
        return
    os.makedirs(args.out, exist_ok=True)
    legs = set(args.legs.split(","))

    moons_summary = run_moons(args.out) if "moons" in legs else None
    if "house" not in legs:
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump({"moons": moons_summary}, f, indent=1)
        return

    (xtr, ytr), (xte, yte), stats, bins, schema = load_kc_house()
    print(f"kc_house: {len(ytr)} train / {len(yte)} test "
          f"(same seed-42 split as the reference)")

    # ---- import the reference's trained weights ----
    clf_model = TabularClassifier()
    clf_tpl = clf_model.init(jax.random.key(0), jnp.zeros((2, 17)),
                             train=False)
    clf_vars = migrate.validate_against(
        migrate.import_house_classifier(f"{REF}/clf_model.pt"),
        {k: clf_tpl[k] for k in ("params", "batch_stats")}, "house clf")
    clf_state = NetState.create(dict(clf_vars), adam_like_torch(1e-3))

    cfg = CounterGANConfig(
        adv_loss="wasserstein", reg_reduction="per_sample_norm",
        clamp_cf=None, hidden_dim=32, num_res_blocks=5, gumbel_tau=0.5,
    )
    g_model = TabularResidualGenerator(
        input_dim=schema.input_dim, hidden_dim=32, num_classes=4,
        continuous_idx=schema.continuous_idx,
        categorical_info=schema.categorical_info, n_blocks=5,
    )
    g_tpl = g_model.init(
        {"params": jax.random.key(0), "gumbel": jax.random.key(1)},
        jnp.zeros((2, 17)), jnp.zeros((2, 4)), jnp.ones((2, 17)),
        train=False)
    g_vars = migrate.validate_against(
        migrate.import_house_generator(f"{REF}/generator_model.pt"),
        {k: g_tpl[k] for k in ("params", "batch_stats")}, "house G")

    # ---- classifier: compare against the committed classifier_report ----
    logits_fn, _ = make_eval_fn(clf_model)
    clf_eval = evaluate_classifier(
        logits_fn, clf_state, jnp.asarray(xte), np.asarray(yte),
        out_dir=args.out, class_names=[f"Q{i}" for i in range(4)],
    )
    acc = clf_eval["accuracy"]
    print(f"imported reference classifier accuracy: {acc:.4f} "
          f"(reference's committed report: 0.7046)")

    # ---- counterfactual sweep with the imported generator ----
    bundle = build_tabular_countergan(cfg, clf_model, clf_state, schema,
                                      stats, num_classes=4, seed=0)

    def clf_fn(x):
        return clf_model.apply(dict(clf_vars), x, train=False)

    key = jax.random.key(args.seed)
    mask = immutable_mask(len(yte), schema)
    xte_j = jnp.asarray(xte)

    # reference protocol: un-clamped x + masked_residual
    def cf_unclamped(g, x, t, m, k):
        _, raw, masked = bundle.cf_fn(g, x, t, m, k)
        return x + masked, raw, masked

    rows = {}
    for proto, cf in (("reference_protocol", cf_unclamped),
                      ("clamped", bundle.cf_fn)):
        sweep = sweep_all_targets(cf, clf_fn, g_vars, xte_j, mask, 4, key)
        df = per_target_metrics_from_sweep(sweep, xte, yte, 4)
        df.to_csv(os.path.join(args.out, f"countergan_metrics_{proto}.csv"),
                  index=False)
        rows[proto] = df
        print(f"\n[{proto}]")
        print(df)

    df = rows["reference_protocol"]
    print("\n=== cfgan eval of the reference's own weights vs its committed "
          "CSV (reference protocol) ===")
    comparison = []
    for t in range(4):
        row = {"target": t}
        for col in ("class_flip_rate", "prediction_gain",
                    "avg_actionability"):
            ours = float(df[df.target_class == t][col].iloc[0])
            ref = REF_COMMITTED[col][t]
            row[col] = {"cfgan_on_ref_weights": round(ours, 4),
                        "reference_committed": round(ref, 4),
                        "delta": round(ours - ref, 4)}
        comparison.append(row)
        print(f"  target {t}: flip {row['class_flip_rate']['cfgan_on_ref_weights']:.4f} "
              f"vs {row['class_flip_rate']['reference_committed']:.4f} | "
              f"gain {row['prediction_gain']['cfgan_on_ref_weights']:.4f} "
              f"vs {row['prediction_gain']['reference_committed']:.4f} | "
              f"action {row['avg_actionability']['cfgan_on_ref_weights']:.4f} "
              f"vs {row['avg_actionability']['reference_committed']:.4f}")

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({
            "classifier_accuracy": {"cfgan_on_ref_weights": round(acc, 4),
                                    "reference_committed": 0.7046},
            "per_target": comparison,
            "gumbel_seed": args.seed,
            "moons": moons_summary,
            "note": "reference weights imported via cfgan.migrate "
                    "(weights_only), evaluated by cfgan's eval stack on the "
                    "real kc_house CSV with the reference's seed-42 split; "
                    "residual hard-Gumbel sampling noise is the only "
                    "nondeterministic input",
        }, f, indent=1)
    print(f"\nwrote {args.out}/summary.json")


if __name__ == "__main__":
    main()
