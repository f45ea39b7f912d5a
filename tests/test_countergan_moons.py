"""Integration: moons CounteRGAN end-to-end on a tiny budget.

Golden-envelope test mirroring the reference's committed metrics
(SURVEY.md section 6): with full masks the flip rate should approach 1.0.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgan.core.config import ClassifierConfig, CounterGANConfig
from cfgan.data.moons import load_moons3
from cfgan.data.pipeline import epoch_perm
from cfgan.models.classifiers import MLPClassifier
from cfgan.train.builders import build_moons_countergan
from cfgan.train.classifier import make_eval_fn, train_classifier
from cfgan.train.loop import train_countergan_loop


@pytest.fixture(scope="module")
def trained(moons_data):
    (xtr, ytr), (xte, yte), stats = moons_data
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=400), (xtr, ytr), seed=42
    )
    cfg = CounterGANConfig(
        lambda_cls=2.0, lambda_reg_l1=5.0, lambda_reg_l2=5.0, lambda_mask=3.0
    )
    bundle = build_moons_countergan(cfg, clf_model, clf_state)
    state, history = train_countergan_loop(
        bundle, xtr, ytr, epochs=40, batch_size=64, seed=0, log_every=0
    )
    return clf_model, clf_state, bundle, state, history, (xte, yte)


def test_classifier_accuracy(trained, moons_data):
    clf_model, clf_state, *_ = trained
    (_, _), (xte, yte), _ = moons_data
    _, accuracy = make_eval_fn(clf_model)
    assert accuracy(clf_state, jnp.asarray(xte), np.asarray(yte)) > 0.9


def test_flip_rate_full_mask(trained):
    clf_model, clf_state, bundle, state, history, (xte, yte) = trained
    g_vars = state.g.variables()
    tgt = (jnp.asarray(yte) + 1) % 3
    x = jnp.asarray(xte)
    x_cf, raw, masked = bundle.cf_fn(g_vars, x, tgt, jnp.ones_like(x))
    logits = clf_model.apply(clf_state.variables(), x_cf, train=False)
    flip = float(jnp.mean(jnp.argmax(logits, 1) == tgt))
    assert flip > 0.9, f"flip rate {flip}"


def test_mask_is_hard_constraint(trained):
    _, _, bundle, state, *_ , (xte, yte) = trained
    g_vars = state.g.variables()
    x = jnp.asarray(xte)
    tgt = (jnp.asarray(yte) + 1) % 3
    # zero mask -> identity counterfactual
    x_cf, _, _ = bundle.cf_fn(g_vars, x, tgt, jnp.zeros_like(x))
    np.testing.assert_array_equal(np.asarray(x_cf), np.asarray(x))
    # x-only mask -> feature 1 untouched
    m = jnp.concatenate([jnp.ones((x.shape[0], 1)), jnp.zeros((x.shape[0], 1))], 1)
    x_cf, _, _ = bundle.cf_fn(g_vars, x, tgt, m)
    np.testing.assert_array_equal(np.asarray(x_cf[:, 1]), np.asarray(x[:, 1]))


def test_losses_recorded_and_finite(trained):
    *_, history, _ = trained
    for k in ("d_loss", "g_loss", "g_cls", "flip_rate"):
        assert k in history and len(history[k]) == 40
        assert np.isfinite(history[k]).all()


def test_training_is_deterministic(moons_data):
    """Same seeds -> bitwise-identical epoch metrics (PRNG discipline)."""
    (xtr, ytr), _, _ = moons_data
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=50), (xtr, ytr), seed=1
    )
    cfg = CounterGANConfig()

    def one_epoch():
        bundle = build_moons_countergan(cfg, clf_model, clf_state, seed=7)
        x, y = jnp.asarray(xtr), jnp.asarray(ytr)
        perm = epoch_perm(jax.random.key(3), len(ytr), 64)
        _, m = bundle.epoch_fn(bundle.state, x, y, perm, jax.random.key(4))
        return {k: float(v) for k, v in m.items()}

    a, b = one_epoch(), one_epoch()
    assert a == b


def test_best_classifier_state_survives_donation(moons_data):
    """Regression: run_epoch donates its input state; the kept best-val-acc
    snapshot must not alias the donated buffers (crashed the house pipeline
    with 'Array has been deleted')."""
    from cfgan.core.config import ClassifierConfig
    from cfgan.models.classifiers import MLPClassifier
    from cfgan.train.classifier import train_classifier

    (xtr, ytr), (xte, yte), _ = moons_data
    # absurd lr so validation accuracy fluctuates and "best" is an EARLY
    # epoch whose buffers get donated by later epochs
    state, hist = train_classifier(
        MLPClassifier(),
        ClassifierConfig(lr=5.0, epochs=6, batch_size=64),
        (xtr, ytr), (xte, yte), seed=0, log=lambda *_: None,
    )
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_profiling_hooks(tmp_path, moons_data):
    """jax.profiler trace + StepTimer produce a trace dir and sane rates."""
    from cfgan.core.profiling import StepTimer, annotate, trace

    (xtr, ytr), _, _ = moons_data
    x = jnp.asarray(xtr[:64])
    timer = StepTimer(items_per_step=64)
    with trace(str(tmp_path)):
        with timer.measure():
            with annotate("square"):
                out = jax.jit(lambda a: (a * a).sum())(x)
            timer.fence(out)
    assert timer.elapsed > 0
    assert timer.items_per_sec(1) > 0
    import os

    assert any(os.scandir(str(tmp_path)))  # trace artifacts written


def test_bf16_mixed_precision_all_builders(moons_data):
    """compute_dtype='bfloat16' runs for every builder family with float32
    params and finite losses."""
    from cfgan.core.config import ClassifierConfig, CounterGANConfig
    from cfgan.data.kc_house import load_kc_house
    from cfgan.models.classifiers import MLPClassifier, TabularClassifier
    from cfgan.train.builders import (
        build_moons_countergan,
        build_tabular_countergan,
    )
    from cfgan.train.classifier import train_classifier
    from cfgan.train.state import NetState, adam_like_torch

    (xtr, ytr), _, _ = moons_data
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=20), (xtr, ytr), seed=1
    )
    b = build_moons_countergan(
        CounterGANConfig(compute_dtype="bfloat16"), clf_model, clf_state,
        seed=2,
    )
    st, m = jax.jit(b.step_fn)(b.state, jnp.asarray(xtr[:32]),
                               jnp.asarray(ytr[:32]), jax.random.key(0))
    assert jax.tree_util.tree_leaves(st.g.params)[0].dtype == jnp.float32
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))

    (hxtr, hytr), _, stats, _, schema = load_kc_house(seed=0)
    tclf = TabularClassifier(num_classes=4)
    tclf_state = NetState.create(
        tclf.init({"params": jax.random.key(0), "dropout": jax.random.key(0)},
                  jnp.asarray(hxtr[:2])),
        adam_like_torch(1e-3),
    )
    tb = build_tabular_countergan(
        CounterGANConfig(hidden_dim=16, num_res_blocks=1,
                         compute_dtype="bfloat16"),
        tclf, tclf_state, schema, stats, num_classes=4, seed=3,
    )
    st, m = jax.jit(tb.step_fn)(tb.state, jnp.asarray(hxtr[:32]),
                                jnp.asarray(hytr[:32]), jax.random.key(0))
    assert jax.tree_util.tree_leaves(st.g.params)[0].dtype == jnp.float32
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))


def test_remat_step_matches_no_remat(moons_data):
    """jax.checkpoint on the generator forward changes memory, not math."""
    from cfgan.core.config import ClassifierConfig, CounterGANConfig
    from cfgan.models.classifiers import MLPClassifier
    from cfgan.train.builders import build_moons_countergan
    from cfgan.train.classifier import train_classifier

    (xtr, ytr), _, _ = moons_data
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=20), (xtr, ytr), seed=1
    )
    outs = []
    for remat in (False, True):
        b = build_moons_countergan(
            CounterGANConfig(remat=remat), clf_model, clf_state, seed=4
        )
        st, m = jax.jit(b.step_fn)(b.state, jnp.asarray(xtr[:32]),
                                   jnp.asarray(ytr[:32]), jax.random.key(0))
        outs.append((st, m))
    (st0, m0), (st1, m1) = outs
    np.testing.assert_allclose(float(m0["g_loss"]), float(m1["g_loss"]),
                               rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(st0.g.params),
                     jax.tree_util.tree_leaves(st1.g.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)


def test_generator_ema(moons_data):
    """`ema_decay > 0`: the fused step carries a per-step EMA of the
    generator params — verified against a hand-computed EMA over the live
    param trajectory — and `g_eval_variables` prefers it."""
    from cfgan.train.state import g_eval_variables

    (xtr, ytr), _, _ = moons_data
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=20), (xtr, ytr), seed=1
    )
    dec = 0.9
    b = build_moons_countergan(
        CounterGANConfig(ema_decay=dec), clf_model, clf_state, seed=4
    )
    state = b.state
    expected = jax.tree_util.tree_map(np.asarray, state.g.params)
    step = jax.jit(b.step_fn)
    for i in range(3):
        state, _ = step(state, jnp.asarray(xtr[:32]), jnp.asarray(ytr[:32]),
                        jax.random.key(i))
        expected = jax.tree_util.tree_map(
            lambda e, p: dec * e + (1 - dec) * np.asarray(p),
            expected, state.g.params,
        )
    for e, g in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(state.g_ema)):
        np.testing.assert_allclose(np.asarray(g), e, rtol=1e-6, atol=1e-7)
    # EMA differs from live params and is what eval/serving sees
    gv = g_eval_variables(state)
    leaves_live = jax.tree_util.tree_leaves(state.g.params)
    leaves_eval = jax.tree_util.tree_leaves(gv["params"])
    assert any(
        not np.allclose(a, b_) for a, b_ in zip(leaves_live, leaves_eval)
    )
    # EMA-less states keep the old structure (None) and eval = live params
    b2 = build_moons_countergan(CounterGANConfig(), clf_model, clf_state,
                                seed=4)
    st2, _ = jax.jit(b2.step_fn)(b2.state, jnp.asarray(xtr[:32]),
                                 jnp.asarray(ytr[:32]), jax.random.key(0))
    assert st2.g_ema is None
    assert g_eval_variables(st2)["params"] is st2.g.params
