"""Launch a promptable serving app from experiment checkpoints.

    python -m cfgan.serve.launch --app mnist  [--results results/mnist_countergan]
    python -m cfgan.serve.launch --app house  [--results results/house_countergan]
    python -m cfgan.serve.launch --app moons  [--results results/moons_countergan]
    python -m cfgan.serve.launch --app house --api [--port 8000]   # HTTP JSON API

Equivalent to running the reference's `gr.py` / `gradio_app.py` after
training (`mnist/gr.py:254-277`, `house gradio_app.py:219-259`,
`moons/gradio_app.py:125-162`); requires gradio and a trained checkpoint
tree written by the corresponding `cfgan.experiments.*` main.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from cfgan.core import checkpoint as ckpt
from cfgan.serve.engine import CounterfactualEngine
from cfgan.train.state import NetState, adam_like_torch


def _load_net(path, template_vars, lr=1e-3):
    restored = ckpt.restore(path, dict(template_vars))
    return NetState.create(restored, adam_like_torch(lr))


def setup_mnist(results_dir: str):
    """Engine + test split from a trained checkpoint tree."""
    from cfgan.data.mnist import load_mnist
    from cfgan.experiments.presets import MNIST_COUNTERGAN as cfg
    from cfgan.models.classifiers import CNNClassifier
    from cfgan.train.builders import build_mnist_countergan

    _, _, (xte, yte) = load_mnist(valid_fraction=cfg.data.valid_fraction)
    clf_model = CNNClassifier()
    clf_tpl = clf_model.init(jax.random.key(0), jnp.zeros((2, 28, 28, 1)))
    clf_state = _load_net(os.path.join(results_dir, "classifier"), clf_tpl)
    bundle = build_mnist_countergan(cfg.countergan, clf_model, clf_state)
    g_state = _load_net(os.path.join(results_dir, "generator"),
                        bundle.state.g.variables())
    # the generator checkpoint holds the SERVED variable set (EMA
    # params + recalibrated BN stats when the recipe carries EMA) —
    # clear g_ema so from_bundle serves exactly what was restored
    bundle.state = bundle.state.replace(g=g_state, g_ema=None)
    engine = CounterfactualEngine.from_bundle(
        bundle, clf_model, clf_state,
        patch_size=cfg.countergan.mask.patch_size,
    )
    return engine, xte, yte, cfg.countergan.mask.patch_size


def launch_mnist(results_dir: str, share: bool = False,
                 host: str = "127.0.0.1"):
    from cfgan.serve.apps import build_mnist_app

    engine, xte, yte, patch_size = setup_mnist(results_dir)
    app = build_mnist_app(engine, xte, yte, patch_size)
    app.launch(server_name=host, share=share)


def setup_house(results_dir: str):
    from cfgan.data.kc_house import load_kc_house
    from cfgan.experiments.presets import HOUSE_COUNTERGAN as cfg
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.train.builders import build_tabular_countergan

    (xtr, ytr), (xte, yte), stats, bins, schema = load_kc_house()
    clf_model = TabularClassifier()
    clf_tpl = clf_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(0)},
        jnp.asarray(xte[:2]),
    )
    clf_state = _load_net(os.path.join(results_dir, "classifier"), clf_tpl)
    bundle = build_tabular_countergan(cfg.countergan, clf_model, clf_state,
                                      schema, stats)
    g_state = _load_net(os.path.join(results_dir, "generator"),
                        bundle.state.g.variables())
    # the generator checkpoint holds the SERVED variable set (EMA
    # params + recalibrated BN stats when the recipe carries EMA) —
    # clear g_ema so from_bundle serves exactly what was restored
    bundle.state = bundle.state.replace(g=g_state, g_ema=None)
    engine = CounterfactualEngine.from_bundle(
        bundle, clf_model, clf_state, schema=schema, stats=stats,
    )
    return engine, xte, yte, schema, stats, bins


def launch_house(results_dir: str, share: bool = False,
                 host: str = "127.0.0.1"):
    from cfgan.serve.apps import build_house_app

    engine, xte, yte, schema, stats, bins = setup_house(results_dir)
    app = build_house_app(engine, xte, yte, schema, stats, bins)
    app.launch(server_name=host, share=share)


def setup_moons(results_dir: str):
    from cfgan.data.moons import load_moons3
    from cfgan.experiments.presets import MOONS_COUNTERGAN as cfg
    from cfgan.models.classifiers import MLPClassifier
    from cfgan.train.builders import build_moons_countergan

    (xtr, ytr), (xte, yte), stats = load_moons3()
    clf_model = MLPClassifier(hidden_dim=cfg.classifier.hidden_dim)
    clf_tpl = clf_model.init(jax.random.key(0), jnp.asarray(xte[:2]))
    clf_state = _load_net(os.path.join(results_dir, "classifier"), clf_tpl)
    bundle = build_moons_countergan(cfg.countergan, clf_model, clf_state)
    g_state = _load_net(os.path.join(results_dir, "generator"),
                        bundle.state.g.variables())
    # the generator checkpoint holds the SERVED variable set (EMA
    # params + recalibrated BN stats when the recipe carries EMA) —
    # clear g_ema so from_bundle serves exactly what was restored
    bundle.state = bundle.state.replace(g=g_state, g_ema=None)
    engine = CounterfactualEngine.from_bundle(bundle, clf_model, clf_state)

    clf_vars = clf_state.variables()

    def clf_fn(x):
        return clf_model.apply(clf_vars, x, train=False)

    return engine, clf_fn, xte, yte


def launch_moons(results_dir: str, share: bool = False,
                 host: str = "127.0.0.1"):
    from cfgan.serve.apps import build_moons_app

    engine, clf_fn, xte, yte = setup_moons(results_dir)
    app = build_moons_app(engine, clf_fn, xte, yte)
    app.launch(server_name=host, share=share)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--app", required=True, choices=("mnist", "house", "moons"))
    ap.add_argument("--results", default=None)
    ap.add_argument("--share", action="store_true")
    ap.add_argument(
        "--host", default=os.environ.get("CFGAN_SERVE_HOST", "127.0.0.1"),
        help="bind address; loopback by default (the apps load checkpoints "
        "and may call configured LLM providers, so exposing them on all "
        "interfaces is an explicit opt-in: --host 0.0.0.0)",
    )
    ap.add_argument(
        "--api", action="store_true",
        help="serve the HTTP JSON API (cfgan.serve.api, no gradio needed) "
        "instead of the gradio app",
    )
    ap.add_argument("--port", type=int, default=8000,
                    help="API port (only with --api)")
    ap.add_argument("--shard", action="store_true",
                    help="data-parallel serving over all local devices "
                    "(engine.shard on a 1-D mesh; only with --api)")
    args = ap.parse_args()
    default = {"mnist": "results/mnist_countergan",
               "house": "results/house_countergan",
               "moons": "results/moons_countergan"}[args.app]
    results = args.results or default
    if args.api:
        from cfgan.serve.api import serve as api_serve

        engine = {"mnist": setup_mnist, "house": setup_house,
                  "moons": setup_moons}[args.app](results)[0]
        if args.shard:
            from cfgan.parallel.mesh import create_mesh

            engine = engine.shard(create_mesh())
        api_serve(engine, args.host, args.port)
        return
    {"mnist": launch_mnist, "house": launch_house,
     "moons": launch_moons}[args.app](results, args.share, args.host)


if __name__ == "__main__":
    main()
