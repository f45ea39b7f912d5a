"""Recipe search for the house (tabular) CounteRGAN default preset.

VERDICT r3 next-step #3: the default `house_countergan` preset (the
reference-exact recipe) loses to the reference under the reference's own
un-clamped protocol, and the clamp-trained side preset wins the honest
protocol but not quite the reference one.  This tool greed-grids candidate
recipes (clamp-trained variants: lambda_cls, epochs, width, proximity
weight) across seeds and scores BOTH protocols per target:

  honest:     flips of clamp(x + masked_residual, 0, 1)     (legal data)
  reference:  flips of x + masked_residual, un-clamped
              (`house_sales_kc_usa/eval_utils.py:244-245` -- the
              reference's published CSV numbers use this)

Promotion bar (VERDICT): reference-protocol flips >= 1.000/0.991/0.980/
0.996 per target AND honest >= 0.98 per target, on 3+ seeds.

Usage:
  python tools/house_recipe_search.py [--seeds 42,43,44] [--recipes a,b,...]
      [--out results/house_recipe_search] [--smoke]
Streams one JSON line per (recipe, seed) into <out>/search.jsonl and a
final summary into <out>/search.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# candidate recipes: overrides on HOUSE_COUNTERGAN_CLAMPED's countergan cfg
RECIPES = {
    "clamp_base": {},  # = HOUSE_COUNTERGAN_CLAMPED (150 ep, l_cls 4)
    "clamp_cls5": {"lambda_cls": 5.0},
    "clamp_cls6": {"lambda_cls": 6.0},
    "clamp_250ep": {"epochs": 250},
    "clamp_cls5_250ep": {"lambda_cls": 5.0, "epochs": 250},
    "clamp_hidden64": {"hidden_dim": 64},
    "clamp_reg05": {"lambda_reg_l1": 0.5},
    # wave 2: the out-of-range residual penalty (lambda_range) keeps the
    # UN-clamped counterfactual inside [0,1], making the two protocols
    # agree — wave 1 measured the un-clamped eval of clamp-trained models
    # as chaotic (as low as 0.76 on seeds where the honest flip was 0.96+)
    "range10": {"lambda_range": 10.0},
    "range10_cls5": {"lambda_range": 10.0, "lambda_cls": 5.0},
    "range10_250ep": {"lambda_range": 10.0, "epochs": 250},
    "range25_cls5_250ep": {"lambda_range": 25.0, "lambda_cls": 5.0,
                           "epochs": 250},
    "range10_reg05_250ep": {"lambda_range": 10.0, "lambda_reg_l1": 0.5,
                            "epochs": 250},
    # wave 3: range10_250ep passed the full bar on seed 44 and missed by
    # 0.002-0.02 on single targets elsewhere — EMA (the lever that rescued
    # MNIST's worst seeds) and longer schedules to close the tail
    "range10_250ep_ema": {"lambda_range": 10.0, "epochs": 250,
                          "ema_decay": 0.999},
    "range10_350ep": {"lambda_range": 10.0, "epochs": 350},
    "range10_350ep_ema": {"lambda_range": 10.0, "epochs": 350,
                          "ema_decay": 0.999},
    "range25_250ep": {"lambda_range": 25.0, "epochs": 250},
    # wave 4 (post-outage stack): the TPU service stack changed across the
    # round-4 outage and GAN training is chaotic to compiler-level numerics
    # — wave-3's all-seed winner no longer clears the reference-protocol
    # target-1 bar (0.991) on re-run (0.983-0.987 across seeds).  Target-1
    # is the consistent miss, so push the classifier term on the long
    # schedule.
    "range10_cls5_350ep": {"lambda_range": 10.0, "lambda_cls": 5.0,
                           "epochs": 350},
    "range10_cls6_350ep": {"lambda_range": 10.0, "lambda_cls": 6.0,
                           "epochs": 350},
    # round 5: EMA-tracking twin of wave-4's seed-43 winner — EMA is
    # passive (training trajectory identical to range10_cls5_350ep), it
    # just adds the EMA+BN-recal serving candidates to the snapshot
    # ladder (tools/house_ladder_matrix.py)
    "range10_cls5_350ep_ema": {"lambda_range": 10.0, "lambda_cls": 5.0,
                               "epochs": 350, "ema_decay": 0.999},
}

# the reference's committed per-target flips (its own protocol),
# house_sales_kc_usa/results/countergan_metrics.csv:2-5
REF_FLIPS = [1.000, 0.991, 0.980, 0.996]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", default="42,43,44")
    ap.add_argument("--recipes", default=",".join(RECIPES))
    ap.add_argument("--out", default="results/house_recipe_search")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny run to validate plumbing")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    names = [r for r in args.recipes.split(",") if r]

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from bench import _setup_compile_cache

    _setup_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from sklearn.model_selection import train_test_split

    from cfgan.core.config import replace as cfg_replace
    from cfgan.data.kc_house import load_kc_house
    from cfgan.eval.tabular import (
        immutable_mask,
        per_target_metrics_from_sweep,
        sweep_all_targets,
    )
    from cfgan.experiments.presets import HOUSE_COUNTERGAN_CLAMPED
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.train.builders import (
        build_tabular_countergan,
        g_serving_variables,
    )
    from cfgan.train.classifier import train_classifier
    from cfgan.train.loop import train_countergan_loop

    base = HOUSE_COUNTERGAN_CLAMPED
    (xtr, ytr), (xte, yte), stats, bins, schema = load_kc_house(
        path=base.data.path, seed=base.data.seed,
        test_fraction=base.data.test_fraction,
    )
    if args.smoke:
        xtr, ytr = xtr[:600], ytr[:600]
        xte, yte = xte[:200], yte[:200]

    os.makedirs(args.out, exist_ok=True)
    stream_path = os.path.join(args.out, "search.jsonl")
    rows = []

    clf_cache = {}

    def classifier_for(seed):
        if seed not in clf_cache:
            cfg = base.replace(seed=seed)
            if args.smoke:
                cfg = cfg.replace(classifier=cfg_replace(cfg.classifier,
                                                         epochs=2))
            itr, iva = train_test_split(
                np.arange(len(ytr)), test_size=0.15, stratify=ytr,
                random_state=seed,
            )
            clf_model = TabularClassifier(num_classes=cfg.num_classes)
            clf_state, _ = train_classifier(
                clf_model, cfg.classifier, (xtr[itr], ytr[itr]),
                (xtr[iva], ytr[iva]), seed=seed,
                num_classes=cfg.num_classes,
            )
            clf_vars = clf_state.variables()
            clf_cache[seed] = (clf_model, clf_state,
                               lambda x, cv=clf_vars, cm=clf_model:
                               cm.apply(cv, x, train=False))
        return clf_cache[seed]

    for name in names:
        for seed in seeds:
            over = dict(RECIPES[name])
            if args.smoke:
                over["epochs"] = 3
                over["hidden_dim"] = min(over.get("hidden_dim", 16), 16)
                over["num_res_blocks"] = 1
            cg = cfg_replace(base.countergan, **over)
            clf_model, clf_state, clf_fn = classifier_for(seed)
            bundle = build_tabular_countergan(
                cg, clf_model, clf_state, schema, stats,
                num_classes=base.num_classes, seed=seed,
            )
            t0 = time.time()
            state, _ = train_countergan_loop(
                bundle, xtr, ytr, epochs=cg.epochs,
                batch_size=base.data.batch_size, seed=seed, log_every=10**9,
            )
            g_vars = g_serving_variables(
                bundle, state, xtr,
                jax.random.fold_in(jax.random.key(seed), 777),
            )
            key = jax.random.key(seed)
            mask = immutable_mask(len(yte), schema)
            sweep = sweep_all_targets(bundle.cf_fn, clf_fn, g_vars,
                                      xte, mask, base.num_classes, key)
            honest = per_target_metrics_from_sweep(
                sweep, xte, yte, base.num_classes)["class_flip_rate"]

            def cf_unclamped(g, x, t, m, k):
                _, raw, masked = bundle.cf_fn(g, x, t, m, k)
                return x + masked, raw, masked

            sweep_ref = sweep_all_targets(cf_unclamped, clf_fn, g_vars,
                                          xte, mask, base.num_classes, key)
            ref = per_target_metrics_from_sweep(
                sweep_ref, xte, yte, base.num_classes)["class_flip_rate"]
            row = {
                "recipe": name, "seed": seed,
                "overrides": RECIPES[name],
                "honest_flips": [round(float(v), 4) for v in honest],
                "reference_flips": [round(float(v), 4) for v in ref],
                "honest_floor": round(float(honest.min()), 4),
                "beats_reference_protocol": bool(
                    all(float(g) >= r - 1e-9
                        for g, r in zip(ref, REF_FLIPS))),
                "honest_ge_098": bool(float(honest.min()) >= 0.98),
                "train_s": round(time.time() - t0, 1),
            }
            rows.append(row)
            with open(stream_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(json.dumps(row), flush=True)

    # summary: per recipe, worst-seed behavior on both bars
    summary = {}
    for name in names:
        rs = [r for r in rows if r["recipe"] == name]
        if not rs:
            continue
        summary[name] = {
            "seeds": [r["seed"] for r in rs],
            "honest_floor_worst_seed": min(r["honest_floor"] for r in rs),
            "all_seeds_beat_reference_protocol": all(
                r["beats_reference_protocol"] for r in rs),
            "all_seeds_honest_ge_098": all(r["honest_ge_098"] for r in rs),
        }
    with open(os.path.join(args.out, "search.json"), "w") as f:
        json.dump({"reference_flips": REF_FLIPS, "rows": rows,
                   "summary": summary}, f, indent=1)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
