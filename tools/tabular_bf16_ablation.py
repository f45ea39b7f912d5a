"""Root-cause ablation for tabular bf16's target-1 quality loss.

RESULTS.md (round 2): the clamp-trained KC-house recipe at bf16 drops
target 1 to ~0.94 vs f32's 0.98 while image-family bf16 is at full quality
parity.  Candidate site: the Gumbel-Softmax categorical path —
exp((logits+g)/tau) at tau=0.5 doubles bf16 logit quantization error inside
an exp and then argmaxes, the one structure the image pipeline doesn't have
(`house models/generator.py:86-90`).

Arms (same data, same frozen classifier from the committed clamp-trained
run, same seeds):
  f32          — baseline
  bf16         — full bf16 compute (the round-2 configuration)
  bf16_headf32 — bf16 trunk, f32 categorical heads + Gumbel
                 (CounterGANConfig.cat_head_f32)

If bf16_headf32 restores f32's flip rates, the site is confirmed and the
mixed policy becomes the tabular bf16 default; if not, documented negative
result in BASELINE.md.

Usage: python tools/tabular_bf16_ablation.py [--seeds 42,43] [--out ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="42,43")
    ap.add_argument("--arms", default="f32,bf16,bf16_headf32")
    ap.add_argument("--out", default="results/tabular_bf16_ablation")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    arms = args.arms.split(",")

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    from bench import _setup_compile_cache

    _setup_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from cfgan.core import checkpoint as ckpt
    from cfgan.core.config import replace as cfg_replace
    from cfgan.data.kc_house import load_kc_house
    from cfgan.eval.tabular import (
        immutable_mask,
        per_target_metrics_from_sweep,
        sweep_all_targets,
    )
    from cfgan.experiments.presets import HOUSE_COUNTERGAN_CLAMPED
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.train.builders import build_tabular_countergan
    from cfgan.train.loop import train_countergan_loop
    from cfgan.train.state import NetState, adam_like_torch

    cfg = HOUSE_COUNTERGAN_CLAMPED
    (xtr, ytr), (xte, yte), stats, _, schema = load_kc_house(seed=cfg.data.seed)
    clf_model = TabularClassifier(num_classes=cfg.num_classes)
    clf_dir = os.path.join("results", "house_countergan_clamped", "classifier")
    if ckpt.exists(clf_dir) and not args.smoke:
        template = clf_model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)},
            jnp.asarray(xtr[:2]),
        )
        restored = ckpt.restore(clf_dir, dict(template))
        clf_state = NetState.create(restored,
                                    adam_like_torch(cfg.classifier.lr))
        print(f"[ablation] loaded classifier from {clf_dir}", file=sys.stderr)
    else:
        from cfgan.core.config import ClassifierConfig
        from cfgan.train.classifier import train_classifier

        clf_state, _ = train_classifier(
            clf_model, ClassifierConfig(lr=5e-4, epochs=2, batch_size=128),
            (xtr, ytr), (xte, yte), seed=1,
        )
    clf_vars = clf_state.variables()

    def clf_fn(x):
        return clf_model.apply(clf_vars, x, train=False)

    # cat_head_f32 is pinned per arm so the arms stay meaningful regardless
    # of the config default (flipped to True after this ablation's result)
    ARMS = {
        "f32": {"cat_head_f32": False},
        "bf16": {"compute_dtype": "bfloat16", "cat_head_f32": False},
        "bf16_headf32": {"compute_dtype": "bfloat16", "cat_head_f32": True},
    }
    rows = []
    os.makedirs(args.out, exist_ok=True)
    for arm in arms:
        for seed in seeds:
            gcfg = cfg_replace(cfg.countergan, **ARMS[arm])
            if args.smoke:
                gcfg = cfg_replace(gcfg, hidden_dim=16, num_res_blocks=1,
                                   epochs=1)
            t0 = time.time()
            bundle = build_tabular_countergan(
                gcfg, clf_model, clf_state, schema, stats,
                num_classes=cfg.num_classes, seed=seed, diagnostics=False,
            )
            state, _ = train_countergan_loop(
                bundle, xtr, ytr, epochs=gcfg.epochs,
                batch_size=cfg.data.batch_size, seed=seed, log_every=0,
            )
            g_vars = {"params": state.g.params, **state.g.stats}
            mask = immutable_mask(len(yte), schema)
            sweep = sweep_all_targets(
                bundle.cf_fn, clf_fn, g_vars, jnp.asarray(xte), mask,
                cfg.num_classes, jax.random.key(7),
            )
            df = per_target_metrics_from_sweep(sweep, xte, yte,
                                               cfg.num_classes)
            flips = df["class_flip_rate"].to_numpy()
            row = {
                "arm": arm, "seed": seed,
                "per_target_flip": [round(float(f), 4) for f in flips],
                "target1_flip": round(float(flips[1]), 4),
                "worst_flip": round(float(np.nanmin(flips)), 4),
                "train_s": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(os.path.join(args.out, "ablation.json"), "w") as f:
                json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
