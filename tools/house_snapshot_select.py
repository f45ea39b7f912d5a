"""Epoch-snapshot serving selection for the house CounteRGAN default.

ROUND-5 STATUS: superseded as a shipping mechanism — snapshot selection
is now wired into the experiment main itself
(`cfgan.experiments.house_countergan` + `cfgan.train.selection`, enabled
by `CounterGANConfig.snapshot_every`), with an improved score
(lexicographic sorted margins on a val+8k-train fold; see
`tools/house_ladder_matrix.py` for the study that chose it).  Kept as
the round-4 research artifact that established the trajectory-selection
idea (results/house_snapshot_select*/).

Wave 4 (`results/house_recipe_search_wave4/search.json`) measured that no
END-OF-TRAINING recipe of 13 tried clears the reference's committed
per-target flips (1.000/0.991/0.980/0.996,
`house_sales_kc_usa/results/countergan_metrics.csv:2-5`) on every seed
under the current TPU stack — GAN end states are chaotic, and the
per-seed winners don't generalize.  The lever this tool adds is the time
axis: long-schedule GAN training oscillates through many near-optimal
generators, so instead of shipping whichever one epoch N lands on, score
a LADDER of epoch snapshots on a held-out validation fold and ship the
best (the same validation-scored serving-selection philosophy the MNIST
default already uses, `cfgan.train.builders.select_g_serving_variables`,
extended from {live, EMA-recal} candidates to the training trajectory).

Selection score per snapshot (validation fold only — test is never seen):
worst-target margin over the reference's committed flips under the
reference's own un-clamped protocol, tie-broken by the honest clamped
floor.  The selected snapshot is then scored once on TEST for the report.

The manual epoch loop reproduces `cfgan.train.loop.train_countergan_loop`
exactly (same stateless fold_in key schedule), so epoch N here is
bit-identical to epoch N of the shipped training loop.

Usage:
  python tools/house_snapshot_select.py [--recipes range10_350ep]
      [--seeds 42,43,44] [--every 25] [--out results/house_snapshot_select]
      [--smoke]
Streams one JSON line per (recipe, seed) into <out>/select.jsonl and a
summary into <out>/select.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from house_recipe_search import RECIPES, REF_FLIPS  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--recipes", default="range10_350ep")
    ap.add_argument("--seeds", default="42,43,44")
    ap.add_argument("--every", type=int, default=25,
                    help="snapshot/score every K epochs (plus the final)")
    ap.add_argument("--out", default="results/house_snapshot_select")
    ap.add_argument("--smoke", action="store_true")
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
    from cfgan.data.pipeline import epoch_perm
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

    base = HOUSE_COUNTERGAN_CLAMPED
    (xtr, ytr), (xte, yte), stats, bins, schema = load_kc_house(
        path=base.data.path, seed=base.data.seed,
        test_fraction=base.data.test_fraction,
    )
    if args.smoke:
        xtr, ytr = xtr[:600], ytr[:600]
        xte, yte = xte[:200], yte[:200]

    os.makedirs(args.out, exist_ok=True)
    stream_path = os.path.join(args.out, "select.jsonl")
    rows = []

    clf_cache = {}

    def classifier_for(seed):
        # per-seed classifier + the SAME stratified fold the house main
        # uses for EMA serving selection (experiments/house_countergan.py)
        if seed not in clf_cache:
            cfg = base.replace(seed=seed)
            if args.smoke:
                cfg = cfg.replace(classifier=cfg_replace(cfg.classifier,
                                                         epochs=2))
            itr, iva = train_test_split(
                np.arange(len(ytr)), test_size=0.15, stratify=ytr,
                random_state=seed,
            )
            clf_model = TabularClassifier(num_classes=base.num_classes)
            clf_state, _ = train_classifier(
                clf_model, cfg.classifier, (xtr[itr], ytr[itr]),
                (xtr[iva], ytr[iva]), seed=seed,
                num_classes=base.num_classes,
            )
            clf_vars = clf_state.variables()
            clf_cache[seed] = (
                clf_model, clf_state,
                lambda x, cv=clf_vars, cm=clf_model:
                cm.apply(cv, x, train=False),
                iva,
            )
        return clf_cache[seed]

    def both_protocol_flips(bundle, clf_fn, g_vars, x, y, key):
        """(honest clamped flips, reference un-clamped flips) per target."""
        mask = immutable_mask(len(y), schema)
        sweep = sweep_all_targets(bundle.cf_fn, clf_fn, g_vars,
                                  x, mask, base.num_classes, key)
        honest = per_target_metrics_from_sweep(
            sweep, x, y, base.num_classes)["class_flip_rate"]

        def cf_unclamped(g, xx, t, m, k):
            _, raw, masked = bundle.cf_fn(g, xx, t, m, k)
            return xx + masked, raw, masked

        sweep_ref = sweep_all_targets(cf_unclamped, clf_fn, g_vars,
                                      x, mask, base.num_classes, key)
        ref = per_target_metrics_from_sweep(
            sweep_ref, x, y, base.num_classes)["class_flip_rate"]
        return (np.asarray(honest, dtype=np.float64),
                np.asarray(ref, dtype=np.float64))

    for name in names:
        for seed in seeds:
            over = dict(RECIPES[name])
            if args.smoke:
                over["epochs"] = 4
                over["hidden_dim"] = min(over.get("hidden_dim", 16), 16)
                over["num_res_blocks"] = 1
            cg = cfg_replace(base.countergan, **over)
            clf_model, clf_state, clf_fn, iva = classifier_for(seed)
            xva, yva = xtr[iva], ytr[iva]
            bundle = build_tabular_countergan(
                cg, clf_model, clf_state, schema, stats,
                num_classes=base.num_classes, seed=seed,
            )
            every = max(1, args.every if not args.smoke else 2)
            t0 = time.time()
            # ---- manual epoch loop, bit-identical to train_countergan_loop
            state = bundle.state
            x = jnp.asarray(xtr)
            y = jnp.asarray(ytr)
            n = len(ytr)
            key = jax.random.key(seed)
            ladder = []
            best = None  # (score tuple, epoch, host-copied g_vars)
            for epoch in range(cg.epochs):
                k_perm = jax.random.fold_in(key, 2 * epoch)
                k_step = jax.random.fold_in(key, 2 * epoch + 1)
                perm = epoch_perm(k_perm, n, base.data.batch_size)
                state, _ = bundle.epoch_fn(state, x, y, perm, k_step)
                if (epoch + 1) % every and (epoch + 1) != cg.epochs:
                    continue
                g_vars = g_serving_variables(
                    bundle, state, xtr,
                    jax.random.fold_in(jax.random.key(seed), 777))
                va_honest, va_ref = both_protocol_flips(
                    bundle, clf_fn, g_vars, xva, yva, jax.random.key(seed))
                margin = float(np.min(va_ref - np.asarray(REF_FLIPS)))
                score = (margin, float(va_honest.min()))
                ladder.append({
                    "epoch": epoch + 1,
                    "val_ref_flips": [round(v, 4) for v in va_ref],
                    "val_honest_flips": [round(v, 4) for v in va_honest],
                    "val_margin": round(margin, 4),
                })
                if best is None or score > best[0]:
                    # epoch_fn donates its input state: keep the winning
                    # snapshot as a HOST copy so next epoch can't reuse
                    # (and invalidate) its buffers
                    best = (score, epoch + 1, jax.device_get(g_vars))
                print(f"[snapshot] {name} seed {seed} epoch {epoch+1}: "
                      f"val margin {margin:+.4f} honest floor "
                      f"{va_honest.min():.4f}", file=sys.stderr)
            train_s = time.time() - t0
            # ---- test-set report: selected snapshot vs final epoch
            _, sel_epoch, sel_vars = best
            sel_vars = jax.device_put(sel_vars)
            te_honest, te_ref = both_protocol_flips(
                bundle, clf_fn, sel_vars, xte, yte, jax.random.key(seed))
            fin_vars = g_serving_variables(
                bundle, state, xtr,
                jax.random.fold_in(jax.random.key(seed), 777))
            fe_honest, fe_ref = both_protocol_flips(
                bundle, clf_fn, fin_vars, xte, yte, jax.random.key(seed))
            row = {
                "recipe": name, "seed": seed, "overrides": RECIPES[name],
                "selected_epoch": sel_epoch,
                "ladder": ladder,
                "test_ref_flips": [round(float(v), 4) for v in te_ref],
                "test_honest_flips": [round(float(v), 4) for v in te_honest],
                "final_epoch_test_ref_flips":
                    [round(float(v), 4) for v in fe_ref],
                "final_epoch_test_honest_flips":
                    [round(float(v), 4) for v in fe_honest],
                "beats_reference_protocol": bool(
                    all(float(g) >= r - 1e-9
                        for g, r in zip(te_ref, REF_FLIPS))),
                "honest_ge_098": bool(float(te_honest.min()) >= 0.98),
                "train_s": round(train_s, 1),
            }
            rows.append(row)
            with open(stream_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(json.dumps({k: v for k, v in row.items()
                              if k != "ladder"}), flush=True)

    summary = {}
    for name in names:
        rs = [r for r in rows if r["recipe"] == name]
        if not rs:
            continue
        summary[name] = {
            "seeds": [r["seed"] for r in rs],
            "selected_epochs": [r["selected_epoch"] for r in rs],
            "all_seeds_beat_reference_protocol": all(
                r["beats_reference_protocol"] for r in rs),
            "all_seeds_honest_ge_098": all(r["honest_ge_098"] for r in rs),
            "honest_floor_worst_seed": min(
                min(r["test_honest_flips"]) for r in rs),
        }
    with open(os.path.join(args.out, "select.json"), "w") as f:
        json.dump({"reference_flips": REF_FLIPS, "rows": rows,
                   "summary": summary}, f, indent=1)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()


