"""Re-select the served generator candidate for existing MNIST run dirs.

For each run directory (containing `classifier/`, `train_state/`), loads the
full train state, runs validation-scored serving-candidate selection
(`cfgan.train.builders.select_g_serving_variables`: live params vs EMA +
BN-stats recalibrated under training masks vs under all-ones masks), and
rewrites `generator/` with the winner + the selection record in metadata.
The run dir's eval artifacts are then STALE: this tool deletes
`run_provenance.json` (cfgan.core.provenance) so `tools/check_provenance.py`
fails the dir until the experiment main is rerun (same --seed/--out-dir,
no --fresh) to regenerate the CSVs from the reselected checkpoint.

Usage:
  python tools/reselect_serving.py results/mnist_countergan=42 \
      results/mnist_countergan_seed46=46 [--preset mnist_countergan]

The recipe is resolved per run dir: --preset wins, else the preset recorded
in the dir's run_provenance.json, else the default MNIST_COUNTERGAN.
Advisor r3: a train_state saved by an EMA-less recipe carries no g_ema —
restoring it into an EMA template would inject init params as the "EMA"
(checkpoint.py compat shim) and selection would score garbage candidates;
such states are detected from the raw msgpack and scored live-only.

Exists because the EMA-serving fix landed after several runs were trained
(RESULTS.md round 3); also useful whenever selection logic or the
validation split changes.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _checkpoint_has_g_ema(path: str) -> bool:
    """True when the raw train_state msgpack carries a real (non-None)
    g_ema — WITHOUT going through checkpoint.restore's compat shim."""
    from flax import serialization

    with open(os.path.join(path, "checkpoint.msgpack"), "rb") as f:
        state_dict = serialization.msgpack_restore(f.read())
    return bool(state_dict.get("g_ema"))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("runs", nargs="+", metavar="DIR=SEED",
                    help="run directory and the seed it was trained with")
    ap.add_argument("--preset", default=None,
                    help="recipe name (cfgan.experiments.presets.PRESETS); "
                    "default: the run dir's recorded preset, else "
                    "mnist_countergan")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu — the axon "
                    "sitecustomize pins the env default)")
    ap.add_argument("--force", action="store_true",
                    help="reselect even when the dir currently serves an "
                    "epoch snapshot (which this tool would downgrade)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from cfgan.core import checkpoint as ckpt
    from cfgan.core.provenance import PROVENANCE_FILE, invalidate_run_provenance
    from cfgan.data.mnist import load_mnist
    from cfgan.experiments.presets import MNIST_COUNTERGAN, PRESETS
    from cfgan.models.classifiers import CNNClassifier
    from cfgan.train.builders import (
        build_mnist_countergan,
        select_g_serving_variables,
    )
    from cfgan.train.state import NetState, adam_like_torch

    def resolve_preset(out: str):
        if args.preset is not None:
            return PRESETS[args.preset]
        prov = os.path.join(out, PROVENANCE_FILE)
        if os.path.exists(prov):
            with open(prov) as f:
                name = json.load(f).get("preset")
            if name and name in PRESETS:
                return PRESETS[name]
        return MNIST_COUNTERGAN

    data_cache = {}
    for spec in args.runs:
        out, _, seed_s = spec.partition("=")
        seed = int(seed_s)
        cfg = resolve_preset(out).replace(seed=seed)
        dk = (cfg.data.path, cfg.data.seed, cfg.data.valid_fraction)
        if dk not in data_cache:
            data_cache[dk] = load_mnist(path=dk[0], seed=dk[1],
                                        valid_fraction=dk[2])
        (xtr, ytr), (xva, yva), _ = data_cache[dk]
        clf_model = CNNClassifier(num_classes=cfg.num_classes)
        template = clf_model.init(jax.random.key(0), jnp.asarray(xtr[:2]))
        clf_vars = ckpt.restore(os.path.join(out, "classifier"),
                                dict(template))
        clf_state = NetState.create(clf_vars,
                                    adam_like_torch(cfg.classifier.lr))

        def clf_fn(x, clf_vars=clf_vars, clf_model=clf_model):
            return clf_model.apply(clf_vars, x, train=False)

        # round-5 guard: a dir whose checkpoint serves an epoch SNAPSHOT
        # (snapshot-selection default) cannot be improved by this tool —
        # train_state holds only the END-OF-TRAINING state, so reselecting
        # from it would silently downgrade the served generator
        from cfgan.core.provenance import serving_candidate_of

        cur = serving_candidate_of(out)
        if cur and cur.startswith("snapshot_") and not args.force:
            print(f"{out}: serves {cur!r} (trajectory snapshot) — "
                  "reselection from the end-of-training state would "
                  "downgrade it; rerun the experiment main with --fresh "
                  "instead, or pass --force", flush=True)
            continue
        bundle = build_mnist_countergan(
            cfg.countergan, clf_model, clf_state,
            num_classes=cfg.num_classes, seed=cfg.seed)
        ts_dir = os.path.join(out, "train_state")
        has_ema = _checkpoint_has_g_ema(ts_dir)
        state, _, _ = ckpt.restore_train_state(ts_dir, bundle.state)
        if bundle.state.g_ema is not None and not has_ema:
            print(f"{out}: train_state has no real g_ema (EMA-less recipe "
                  "or pre-EMA checkpoint) — scoring live params only",
                  flush=True)
            state = state.replace(g_ema=None)
        g_vars, sel = select_g_serving_variables(
            bundle, state, xtr,
            jax.random.fold_in(jax.random.key(seed), 777),
            xva, yva, clf_fn)
        ckpt.save(os.path.join(out, "generator"), g_vars,
                  metadata={"serving_selection": sel,
                            "preset": cfg.name, "seed": seed})
        invalidate_run_provenance(
            out, f"serving candidate reselected to {sel['candidate']!r}; "
            "eval CSVs are stale — rerun the experiment main "
            f"(--seed {seed}, same --out-dir, no --fresh)")
        print(f"{out} (seed {seed}): {json.dumps(sel)}", flush=True)


if __name__ == "__main__":
    main()
