"""moons CounteRGAN experiment — the 2-D pedagogical pipeline.

TPU-native equivalent of `conditional_counteRGAN/moons/main.py:14-60`:
train-or-load classifier -> freeze -> train-or-load CounteRGAN ->
per-target metrics + decision-boundary/CF plots.

Run: python -m cfgan.experiments.moons_countergan [--epochs N] [--out-dir D]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from cfgan.core import checkpoint as ckpt
from cfgan.data.moons import load_moons3
from cfgan.eval.boundaries import (
    plot_decision_boundaries_and_cfs,
    plot_decision_boundaries_only,
)
from cfgan.eval.classifier import evaluate_classifier
from cfgan.eval.metrics import make_per_target_sweep, per_target_metrics
from cfgan.experiments.presets import MOONS_COUNTERGAN
from cfgan.models.classifiers import MLPClassifier
from cfgan.train.builders import build_moons_countergan
from cfgan.train.classifier import make_eval_fn, train_classifier
from cfgan.train.loop import plot_loss_curves, train_countergan_loop


def run(cfg=MOONS_COUNTERGAN, out_dir: str | None = None, fresh: bool = False):
    out_dir = out_dir or os.path.join(cfg.out_dir, cfg.name)
    os.makedirs(out_dir, exist_ok=True)
    (xtr, ytr), (xte, yte), stats = load_moons3(seed=cfg.data.seed)

    # ---- stage 1: classifier (skip-if-exists, moons/main.py:19-23) ----
    clf_model = MLPClassifier(num_classes=cfg.num_classes,
                              hidden_dim=cfg.classifier.hidden_dim)
    clf_dir = os.path.join(out_dir, "classifier")
    if ckpt.exists(clf_dir) and not fresh:
        template = clf_model.init(jax.random.key(0), jnp.asarray(xtr[:2]))
        from cfgan.train.state import NetState, adam_like_torch

        restored = ckpt.restore(clf_dir, dict(template))
        clf_state = NetState.create(restored, adam_like_torch(cfg.classifier.lr))
        print(f"Loaded classifier from {clf_dir}")
    else:
        clf_state, _ = train_classifier(
            clf_model, cfg.classifier, (xtr, ytr), seed=cfg.seed
        )
        ckpt.save(clf_dir, clf_state.variables(),
                  metadata={"stats": stats.to_metadata()})

    logits_fn, accuracy = make_eval_fn(clf_model)
    clf_eval = evaluate_classifier(logits_fn, clf_state, xte, yte,
                                   out_dir=os.path.join(out_dir, "classifier_eval"))
    print(f"Classifier test accuracy: {clf_eval['accuracy']:.4f}")

    # ---- stage 2: CounteRGAN (moons/main.py:49-52) ----
    bundle = build_moons_countergan(
        cfg.countergan, clf_model, clf_state, num_classes=cfg.num_classes,
        seed=cfg.seed,
    )
    gen_dir = os.path.join(out_dir, "generator")
    if ckpt.exists(gen_dir) and not fresh:
        g_vars = ckpt.restore(gen_dir, dict(bundle.state.g.variables()))
        from cfgan.train.state import NetState

        bundle.state = bundle.state.replace(
            g=NetState.create(g_vars, bundle.tx_g)
        )
        state = bundle.state
        history = {}
        print(f"Loaded generator from {gen_dir}")
    else:
        sel_key = jax.random.fold_in(jax.random.key(cfg.seed), 777)
        selector = None
        if cfg.countergan.snapshot_every:
            # epoch-snapshot serving selection (same mechanism as the
            # MNIST/house mains, cfgan.train.selection): score each
            # rung's candidates by sorted per-target flips on the
            # TRAINING set (moons has no validation split — the dataset
            # is synthetic and tiny; test is never seen), mean tie-break
            from cfgan.masks.feature import immutable_complement_mask
            from cfgan.train.selection import SnapshotSelector

            sel_sweep = make_per_target_sweep(
                bundle.cf_fn,
                lambda x: clf_model.apply(clf_state.variables(), x,
                                          train=False),
                cfg.num_classes,
                exclude_same_class=True,
                pred_gain_mode="cf_target_minus_orig_target",
                actionability_mode="masked_residual",
            )
            xsc = np.asarray(xtr)
            ysc = np.asarray(ytr)

            def snapshot_score(g_vars):
                dfv = per_target_metrics(
                    sel_sweep, g_vars, xsc, ysc,
                    mask_fn=lambda b: immutable_complement_mask(
                        b, xsc.shape[1], cfg.countergan.mask.immutable_idx),
                    key=jax.random.fold_in(jax.random.key(cfg.seed), 9000),
                    num_classes=cfg.num_classes,
                )
                flips = dfv["class_flip_rate"].to_numpy(dtype=np.float64)
                return tuple(np.sort(flips)) + (float(np.mean(flips)),)

            selector = SnapshotSelector(
                bundle, score_fn=snapshot_score,
                every=cfg.countergan.snapshot_every,
                total_epochs=cfg.countergan.epochs,
                x_recal=xtr, recal_key=sel_key,
            )
        state, history = train_countergan_loop(
            bundle, xtr, ytr,
            epochs=cfg.countergan.epochs,
            batch_size=cfg.data.batch_size,
            seed=cfg.seed,
            log_every=max(1, cfg.countergan.epochs // 10),
            checkpoint_dir=os.path.join(out_dir, "train_state"),
            checkpoint_every=max(1, cfg.countergan.epochs // 4),
            resume=not fresh,  # --fresh means FRESH: ignore old train_state
            epoch_cb=selector.epoch_cb if selector is not None else None,
        )
        if selector is not None:
            g_vars, sel_info = selector.best()
            print(f"Serving candidate: {sel_info['candidate']} "
                  f"(ladder of {len(sel_info['ladder'])} scored snapshots)")
        else:
            from cfgan.train.builders import g_serving_variables

            # live vars for the (EMA-less) preset; EMA params +
            # recalibrated BN stats if the config enables ema_decay
            # (make_bn_recalibrator)
            g_vars = g_serving_variables(bundle, state, xtr, sel_key)
            sel_info = {"candidate": ("live"
                                      if cfg.countergan.ema_decay == 0.0
                                      else "ema_recal_train"),
                        "scores": {}}
        ckpt.save(gen_dir, g_vars,
                  metadata={"serving_selection": sel_info})
        plot_loss_curves(history, os.path.join(out_dir, "loss_curves.png"))

    # ---- stage 3: evaluation (moons/eval_utils.py:227-268) ----
    # `g_vars` comes from either branch above (checkpointed served set, or
    # freshly computed g_serving_variables)

    def clf_fn(x):
        return clf_model.apply(clf_state.variables(), x, train=False)

    sweep = make_per_target_sweep(
        bundle.cf_fn, clf_fn, cfg.num_classes,
        exclude_same_class=True,
        pred_gain_mode="cf_target_minus_orig_target",
        actionability_mode="masked_residual",
    )
    key = jax.random.key(cfg.seed)
    df = per_target_metrics(
        sweep, g_vars, xte, yte,
        mask_fn=lambda b: jnp.ones((b, 2), jnp.float32),
        key=key, num_classes=cfg.num_classes,
    )
    df.to_csv(os.path.join(out_dir, "countergan_metrics.csv"), index=False)
    print(df)

    # mask-policy sweep {both, x_only, y_only, none} — the reference sketches
    # this (commented out at moons/eval_utils.py:232-251); here it runs.
    mask_rows = {
        "both": (1.0, 1.0), "x_only": (1.0, 0.0),
        "y_only": (0.0, 1.0), "none": (0.0, 0.0),
    }
    rows = []
    for name, row in mask_rows.items():
        dfm = per_target_metrics(
            sweep, g_vars, xte, yte,
            mask_fn=lambda b, r=row: jnp.broadcast_to(
                jnp.asarray(r, jnp.float32), (b, 2)
            ),
            key=key, num_classes=cfg.num_classes,
        )
        dfm.insert(0, "mask", name)
        rows.append(dfm)
    import pandas as pd

    pd.concat(rows).to_csv(
        os.path.join(out_dir, "countergan_metrics_per_mask.csv"), index=False
    )

    plot_decision_boundaries_only(
        clf_fn, xte, yte, os.path.join(out_dir, "decision_boundaries.png"),
        num_classes=cfg.num_classes,
    )
    plot_decision_boundaries_and_cfs(
        clf_fn, bundle.cf_fn, g_vars, xte, yte, cfg.num_classes,
        os.path.join(out_dir, "boundaries"), key=key,
    )

    # provenance (cfgan.core.provenance): CSVs <-> served candidate
    from cfgan.core.provenance import (
        serving_candidate_of,
        write_run_provenance,
    )

    stale = os.path.join(out_dir, "STALE.txt")
    if os.path.exists(stale):
        os.remove(stale)
    write_run_provenance(
        out_dir, preset=cfg.name, seed=cfg.seed,
        serving_candidate=serving_candidate_of(out_dir),
        per_target_csv="countergan_metrics.csv",
        extra={"classifier_test_accuracy": clf_eval["accuracy"]},
    )
    return {"classifier": clf_eval, "metrics": df, "state": state}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--clf-steps", type=int, default=None)
    ap.add_argument("--out-dir", type=str, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--reference", action="store_true",
                    help="run the EXACT reference recipe (preset "
                    "moons_countergan_reference) instead of the shipped "
                    "recipe-searched default")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu)")
    args = ap.parse_args()
    from cfgan.core.logging import setup_compile_cache

    setup_compile_cache()  # persistent XLA cache (remote compiles cost minutes)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from cfgan.core.config import replace as cfg_replace
    from cfgan.experiments.presets import MOONS_COUNTERGAN_REFERENCE

    cfg = MOONS_COUNTERGAN_REFERENCE if args.reference else MOONS_COUNTERGAN
    if args.seed is not None:
        cfg = cfg.replace(seed=args.seed)
    if args.epochs is not None:
        cfg = cfg.replace(countergan=cfg_replace(cfg.countergan, epochs=args.epochs))
    if args.clf_steps is not None:
        cfg = cfg.replace(classifier=cfg_replace(cfg.classifier, steps=args.clf_steps))
    run(cfg, out_dir=args.out_dir, fresh=args.fresh)


if __name__ == "__main__":
    main()
