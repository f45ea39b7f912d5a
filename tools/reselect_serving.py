"""Re-select the served generator candidate for existing MNIST run dirs.

For each run directory (containing `classifier/`, `train_state/`), loads the
full train state, runs validation-scored serving-candidate selection
(`cfgan.train.builders.select_g_serving_variables`: live params vs EMA +
BN-stats recalibrated under training masks vs under all-ones masks), and
rewrites `generator/` with the winner + the selection record in metadata.
Rerun the experiment afterwards (same --seed/--out-dir, no --fresh) to
regenerate the eval artifacts from the reselected checkpoint.

Usage:
  python tools/reselect_serving.py results/mnist_countergan=42 \
      results/mnist_countergan_seed46=46 ...

Each positional argument is DIR=SEED. Exists because the EMA-serving fix
landed after several runs were trained (RESULTS.md round 3); also useful
whenever selection logic or the validation split changes.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("runs", nargs="+", metavar="DIR=SEED",
                    help="run directory and the seed it was trained with")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from cfgan.core import checkpoint as ckpt
    from cfgan.data.mnist import load_mnist
    from cfgan.experiments.presets import MNIST_COUNTERGAN
    from cfgan.models.classifiers import CNNClassifier
    from cfgan.train.builders import (
        build_mnist_countergan,
        select_g_serving_variables,
    )
    from cfgan.train.state import NetState, adam_like_torch

    cfg0 = MNIST_COUNTERGAN
    (xtr, ytr), (xva, yva), _ = load_mnist(
        path=cfg0.data.path, seed=cfg0.data.seed,
        valid_fraction=cfg0.data.valid_fraction)

    for spec in args.runs:
        out, _, seed_s = spec.partition("=")
        seed = int(seed_s)
        cfg = cfg0.replace(seed=seed)
        clf_model = CNNClassifier(num_classes=cfg.num_classes)
        template = clf_model.init(jax.random.key(0), jnp.asarray(xtr[:2]))
        clf_vars = ckpt.restore(os.path.join(out, "classifier"),
                                dict(template))
        clf_state = NetState.create(clf_vars,
                                    adam_like_torch(cfg.classifier.lr))

        def clf_fn(x, clf_vars=clf_vars, clf_model=clf_model):
            return clf_model.apply(clf_vars, x, train=False)

        bundle = build_mnist_countergan(
            cfg.countergan, clf_model, clf_state,
            num_classes=cfg.num_classes, seed=cfg.seed)
        state, _, _ = ckpt.restore_train_state(
            os.path.join(out, "train_state"), bundle.state)
        g_vars, sel = select_g_serving_variables(
            bundle, state, xtr,
            jax.random.fold_in(jax.random.key(seed), 777),
            xva, yva, clf_fn)
        ckpt.save(os.path.join(out, "generator"), g_vars,
                  metadata={"serving_selection": sel})
        print(f"{out} (seed {seed}): {json.dumps(sel)}", flush=True)


if __name__ == "__main__":
    main()
