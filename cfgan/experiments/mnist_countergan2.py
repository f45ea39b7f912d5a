"""countergan2-style CLI: a REQUIRED target class for the whole run.

TPU-native rebuild of `conditional_counteRGAN/mnist/countergan2.py` — the
self-contained legacy variant: `--target` is a required argument
(`countergan2.py:17`), every counterfactual in the run aims at that one
class, the classifier is the legacy MaxPool CNN
(`countergan2.py:97-110` == `mnist/modules/classifier.py:4-30`), losses are
the clipped-log sigmoid-D formulation (`countergan2.py:188,198`), and the
run ends by saving `original.png` / `counterfactual.png` / `delta.png`
grids over one test batch (`countergan2.py:219-224`).

Run: python -m cfgan.experiments.mnist_countergan2 --target 5 [--epochs N]
"""
from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--target", type=int, required=True,
                    help="target class for the counterfactuals (0-9), "
                         "required like the reference CLI (countergan2.py:17)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--clf-epochs", type=int, default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out-dir", type=str, default=None)
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()
    from cfgan.core.logging import setup_compile_cache

    setup_compile_cache()  # persistent XLA cache (remote compiles cost minutes)
    if not 0 <= args.target <= 9:
        ap.error("--target must be in 0..9")

    from cfgan.core.config import replace as cfg_replace
    from cfgan.experiments.mnist_countergan import run
    from cfgan.experiments.presets import MNIST_COUNTERGAN2

    cfg = MNIST_COUNTERGAN2
    overrides = {"fixed_target": args.target}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    cfg = cfg.replace(countergan=cfg_replace(cfg.countergan, **overrides))
    if args.clf_epochs is not None:
        cfg = cfg.replace(classifier=cfg_replace(cfg.classifier,
                                                 epochs=args.clf_epochs))
    out_dir = args.out_dir or os.path.join(cfg.out_dir,
                                           f"{cfg.name}_target{args.target}")
    res = run(cfg, out_dir=out_dir, fresh=args.fresh, limit=args.limit,
              legacy_delta=True)

    # original / counterfactual / delta grids over one 16-sample test batch
    # (`countergan2.py:211-224`)
    import jax.numpy as jnp
    import numpy as np

    from cfgan.data.mnist import load_mnist
    from cfgan.eval.samples import save_image_grid

    _, _, (xte, _yte) = load_mnist(limit=args.limit)
    state = res["state"]
    g_vars = {"params": state.g.params, **state.g.stats}
    x = jnp.asarray(xte[:16])
    t = jnp.full((16,), args.target, jnp.int32)
    x_cf, delta, _ = res["cf_fn"](g_vars, x, t, jnp.ones_like(x))
    save_image_grid(np.asarray(x), os.path.join(out_dir, "original.png"),
                    nrow=4)
    save_image_grid(np.asarray(x_cf),
                    os.path.join(out_dir, "counterfactual.png"), nrow=4)
    save_image_grid(np.asarray(delta) * 0.5,  # deltas rendered centered
                    os.path.join(out_dir, "delta.png"), nrow=4)
    print(f"countergan2 artifacts written to {out_dir}")


if __name__ == "__main__":
    main()
