"""Tabular end-state functional parity beyond the chaos horizon.

Trains the reference-preset KC-house CounteRGAN (`house trainer.py:240-316`,
`house_sales_kc_usa/config.py:13-52`) to a short-but-complete schedule in
BOTH frameworks simultaneously (shared data order + per-step Gumbel noise,
`cfgan.testing.run_parity_trace`), then compares the *end-state* per-target
flip rates and prediction gains — the distribution-level instrument that is
correct where per-step loss tracing rightly fails (slow chaotic
amplification, `results/parity/report.md`).

The acceptance criterion is seed-calibrated: across seeds, the
cross-framework per-target |Δflip| must sit inside the spread that
re-seeding a SINGLE framework produces (plus a small epsilon) — i.e. the
frameworks are as close to each other as either is to itself.

Usage:
  nohup python tools/tabular_endstate_parity.py [--seeds 13,14,15]
      [--epochs 5] [--out results/parity] &   # ~15 min/seed on this host
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="13,14,15")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--out", default="results/parity")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from cfgan.core.config import ClassifierConfig, CounterGANConfig
    from cfgan.data.kc_house import load_kc_house
    from cfgan.masks.feature import random_feature_mask
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.testing import TabularCounterganOracle, run_parity_trace
    from cfgan.testing.endstate import endstate_deltas, tabular_endstate_metrics
    from cfgan.train.builders import build_tabular_countergan
    from cfgan.train.classifier import train_classifier

    (xtr, ytr), (xte, yte), stats, _, schema = load_kc_house()
    clf_model = TabularClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=5e-4, epochs=2, batch_size=128),
        (xtr, ytr), (xte, yte), seed=1,
    )
    clf_vars = clf_state.variables()

    def clf_fn(x):
        return clf_model.apply(clf_vars, x, train=False)

    cfg = CounterGANConfig(
        lr_g=1e-3, lr_d=1e-3, lambda_adv=1.0, lambda_cls=2.0,
        lambda_reg_l1=1.0, lambda_reg_l2=0.0, lambda_mask=1.0,
        resample_target=True, hidden_dim=32, num_res_blocks=5,
        gumbel_tau=0.5,
    )

    per_seed = []
    for seed in seeds:
        t0 = time.time()
        bundle = build_tabular_countergan(
            cfg, clf_model, clf_state, schema, stats, seed=seed,
            explicit_gumbel=True,
        )
        oracle = TabularCounterganOracle(bundle, clf_state, cfg, schema,
                                         stats)
        trace, state = run_parity_trace(
            bundle, oracle, xtr, ytr, epochs=args.epochs, batch_size=128,
            num_classes=4, resample_target=True, seed=9 + seed,
            max_steps=None, return_state=True,
            mask_fn=lambda k, xb: random_feature_mask(
                k, xb.shape[0], xb.shape[1], schema.immutable_idx),
        )
        rows = tabular_endstate_metrics(
            bundle, state, oracle, clf_fn, xte, schema, 4,
            jax.random.key(777),
        )
        deltas = endstate_deltas(rows)
        rec = {
            "seed": seed,
            "steps": int(len(trace.d_jax)),
            "rows": rows,
            "flip_delta_max": deltas["flip_delta_max"],
            "gain_delta_max": deltas["gain_delta_max"],
            "loss_trace": trace.summary(),
            "wall_s": round(time.time() - t0, 1),
        }
        per_seed.append(rec)
        print(json.dumps({k: rec[k] for k in
                          ("seed", "steps", "flip_delta_max",
                           "gain_delta_max", "wall_s")}), flush=True)

    # seed-calibrated CI: within-framework across-seed spread per target
    flips = {side: {t: [] for t in range(4)} for side in ("jax", "torch")}
    for rec in per_seed:
        for r in rec["rows"]:
            flips[r["side"]][r["target"]].append(r["flip"])
    seed_spread = {
        t: max(max(v) - min(v) for v in
               (flips["jax"][t], flips["torch"][t]))
        for t in range(4)
    }
    cross = {t: max(abs(flips["jax"][t][i] - flips["torch"][t][i])
                    for i in range(len(seeds)))
             for t in range(4)}
    verdict = {
        t: {
            "cross_framework_flip_delta_max": round(cross[t], 4),
            "within_framework_seed_spread": round(seed_spread[t], 4),
            "inside_ci": cross[t] <= seed_spread[t] + 0.01,
        }
        for t in range(4)
    }
    out = {
        "epochs": args.epochs,
        "seeds": seeds,
        "per_seed": per_seed,
        "verdict": verdict,
        "all_inside_ci": all(v["inside_ci"] for v in verdict.values()),
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"tabular_endstate_{args.epochs}ep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"verdict": verdict,
                      "all_inside_ci": out["all_inside_ci"],
                      "written": path}), flush=True)


if __name__ == "__main__":
    main()
