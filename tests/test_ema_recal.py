"""BatchNorm recalibration for EMA generator params (make_bn_recalibrator).

The per-step generator EMA averages params only; serving/eval must NOT pair
those params with the live params' BN running stats (the SWA pitfall that
collapsed the seed-46 default-recipe run — RESULTS.md).  These tests pin:

1. the compiled recal scan == a hand-rolled eager oracle (same keys),
2. convergence: the recalibrated stats forget their starting point,
3. g_serving_variables wiring: EMA params + recal stats when EMA is on,
   live params + live stats when off.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgan.core.config import CounterGANConfig
from cfgan.masks.patch import random_patch_mask
from cfgan.models.classifiers import CNNClassifier
from cfgan.train.builders import build_mnist_countergan, g_serving_variables
from cfgan.train.state import NetState, adam_like_torch


def _tiny_bundle(ema_decay=0.999, seed=0):
    cfg = CounterGANConfig(hidden_dim=8, num_res_blocks=1,
                           ema_decay=ema_decay)
    clf = CNNClassifier()
    clf_state = NetState.create(
        clf.init(jax.random.key(1), jnp.zeros((2, 28, 28, 1)), train=False),
        adam_like_torch(1e-3),
    )
    b = build_mnist_countergan(cfg, clf, clf_state, seed=seed,
                               diagnostics=False)
    return cfg, b


def _few_steps(bundle, n_steps=3, seed=0):
    rng = np.random.RandomState(seed)
    state = bundle.state
    for i in range(n_steps):
        x = jnp.asarray(rng.uniform(-1, 1, (16, 28, 28, 1)).astype(np.float32))
        y = jnp.asarray(rng.randint(0, 10, 16))
        state, _ = bundle.step_fn(state, x, y, jax.random.key(100 + i))
    return state


def test_recal_scan_matches_python_oracle():
    cfg, b = _tiny_bundle()
    state = _few_steps(b)
    assert state.g_ema is not None
    x = jnp.asarray(np.random.RandomState(7)
                    .uniform(-1, 1, (64, 28, 28, 1)).astype(np.float32))
    key = jax.random.key(42)
    B, steps = 16, 3
    got = b.recal_fn(state.g_ema, dict(state.g.stats), x, key,
                     steps=steps, batch_size=B)

    # eager oracle replicating the scan body key-for-key
    stats = dict(state.g.stats)
    for k in jax.random.split(key, steps):
        ki, kt, km, kg = jax.random.split(k, 4)
        idx = jax.random.randint(ki, (B,), 0, x.shape[0])
        xb = x[idx]
        t = jax.random.randint(kt, (B,), 0, 10)
        m = random_patch_mask(km, B, (28, 28), cfg.mask.patch_size,
                              cfg.mask.num_modifiable_patches, channels=1)
        _, new = b.g_model.apply({"params": state.g_ema, **stats}, xb, t, m,
                                 train=True, mutable=["batch_stats"])
        stats = {**stats, **new}

    # scan-vs-eager fusion differences leave ~1e-6 float noise
    jax.tree_util.tree_map(
        lambda a, e: np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                                rtol=2e-5, atol=2e-6),
        got, stats,
    )


def test_recal_forgets_initial_stats():
    """Same key, two very different starting stats trees -> same result
    (momentum 0.1: the start decays by 0.9^steps)."""
    _, b = _tiny_bundle()
    state = _few_steps(b)
    x = jnp.asarray(np.random.RandomState(8)
                    .uniform(-1, 1, (64, 28, 28, 1)).astype(np.float32))
    key = jax.random.key(5)
    from_live = b.recal_fn(state.g_ema, dict(state.g.stats), x, key,
                           steps=120, batch_size=16)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, dict(state.g.stats))
    from_zero = b.recal_fn(state.g_ema, zeroed, x, key,
                           steps=120, batch_size=16)
    jax.tree_util.tree_map(
        lambda a, e: np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                                atol=1e-3),
        from_live, from_zero,
    )


def test_g_serving_variables_recalibrates_under_ema():
    _, b = _tiny_bundle()
    state = _few_steps(b)
    x = np.random.RandomState(9).uniform(-1, 1, (64, 28, 28, 1)) \
        .astype(np.float32)
    gv = g_serving_variables(b, state, x, jax.random.key(3), steps=5,
                             batch_size=16)
    # params are the EMA set
    jax.tree_util.tree_map(
        lambda a, e: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(e)),
        gv["params"], state.g_ema,
    )
    # stats were recalibrated (differ from the live running stats)
    diffs = jax.tree_util.tree_map(
        lambda a, e: float(jnp.max(jnp.abs(a - e))),
        gv["batch_stats"], state.g.stats["batch_stats"],
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


def test_selection_scores_candidates_and_returns_best():
    from cfgan.train.builders import select_g_serving_variables

    cfg, b = _tiny_bundle()
    state = _few_steps(b)
    rng = np.random.RandomState(11)
    xtr = rng.uniform(-1, 1, (64, 28, 28, 1)).astype(np.float32)
    xva = rng.uniform(-1, 1, (32, 28, 28, 1)).astype(np.float32)
    yva = rng.randint(0, 10, 32)

    # a deliberately simple "classifier": logits from mean pixel buckets so
    # the sweep is cheap and deterministic
    def clf_fn(x):
        m = jnp.mean(x, axis=(1, 2, 3), keepdims=False)
        return jnp.stack([m * (i + 1) for i in range(10)], axis=1)

    gv, info = select_g_serving_variables(
        b, state, xtr, jax.random.key(2), xva, yva, clf_fn, batch_size=32)
    assert set(info["scores"]) == {"live", "ema_recal_train",
                                   "ema_recal_ones"}
    best = max(info["scores"],
               key=lambda n: (info["scores"][n]["worst_flip"],
                              info["scores"][n]["mean_flip"]))
    assert info["candidate"] == best
    expect_params = (state.g.params if best == "live" else state.g_ema)
    jax.tree_util.tree_map(
        lambda a, e: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(e)),
        gv["params"], expect_params,
    )


def test_g_serving_variables_identity_without_ema():
    _, b = _tiny_bundle(ema_decay=0.0)
    state = _few_steps(b)
    assert state.g_ema is None
    x = np.zeros((8, 28, 28, 1), np.float32)
    gv = g_serving_variables(b, state, x, jax.random.key(0))
    ref = {"params": state.g.params, **state.g.stats}
    jax.tree_util.tree_map(
        lambda a, e: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(e)),
        gv, ref,
    )
