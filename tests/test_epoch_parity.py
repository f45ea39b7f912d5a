"""Epoch-scale CounteRGAN trajectory parity vs the eager PyTorch oracle.

Extends the single-step parity tests (test_step_parity*.py) to whole
shuffled epochs through the SCANNED production epoch runner: same data
order, same per-step target/mask samples, Adam + BatchNorm + spectral-norm
state evolving on both sides.  Pins the BASELINE.json "epoch-1 loss
equivalence" north star as per-step loss traces, function-relevant parameter
drift, and eval-mode counterfactual agreement.

Tolerance justification (measured, see results/parity/):
* loss traces stay within ~5e-5 for dozens of steps (f32 reduction-order
  noise only);
* function-relevant weights drift < 3e-5 relative over 3 epochs;
* biases feeding directly into BatchNorm have a mathematically ZERO
  gradient — both frameworks compute ~1e-10 float noise whose SIGN decides
  Adam's full ±lr first-step kick, so those biases random-walk apart at
  ~2e-3/step *in the reference itself* (BN cancels them in train mode).
  Their walk leaks into eval-mode outputs only through the lag between the
  bias and its BN running-mean EMA, bounding eval x_cf disagreement at the
  few-1e-3 level.  This is a property of the architecture (Linear/Conv
  + BN), not an implementation deviation — hence the looser cf_eval bound.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgan.core.config import ClassifierConfig, CounterGANConfig, MaskConfig
from cfgan.masks.feature import random_feature_mask
from cfgan.masks.patch import random_patch_mask
from cfgan.models.classifiers import CNNClassifier, MLPClassifier
from cfgan.testing import (
    MnistCounterganOracle,
    MoonsCounterganOracle,
    run_parity_trace,
)
from cfgan.train.builders import build_mnist_countergan, build_moons_countergan
from cfgan.train.classifier import train_classifier
from cfgan.train.state import NetState, adam_like_torch


@pytest.mark.slow
def test_moons_epoch_parity(moons_data):
    """Two full epochs at the reference preset width (hidden 32, bs 64,
    lambda_cls 2 / l1 5 / l2 5 / mask 3 — `moons/config.py:1-17`)."""
    (xtr, ytr), _, _ = moons_data
    cfg = CounterGANConfig(
        lr_g=1e-3, lr_d=1e-3, lambda_adv=1.0, lambda_cls=2.0,
        lambda_reg_l1=5.0, lambda_reg_l2=5.0, lambda_mask=3.0,
    )
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=200), (xtr, ytr), seed=1
    )
    bundle = build_moons_countergan(cfg, clf_model, clf_state, seed=11)
    oracle = MoonsCounterganOracle(bundle, clf_state, cfg)
    tr = run_parity_trace(
        bundle, oracle, xtr, ytr, epochs=2, batch_size=64, num_classes=3,
        resample_target=True, seed=5,
        mask_fn=lambda k, xb: random_feature_mask(
            k, xb.shape[0], xb.shape[1], ()
        ),
    )
    s = tr.summary()
    assert s["steps"] >= 20
    assert s["d_delta_max"] < 5e-6, s
    assert s["g_delta_max"] < 3e-4, s
    assert s["param_drift_max_rel"] < 1e-4, s
    assert s["cf_eval_delta_max"] < 2e-2, s


@pytest.mark.slow
def test_tabular_epoch_parity():
    """~20 steps of the KC-house tabular pipeline (reduced width for CPU:
    hidden 16, 2 FiLM blocks, batch 64) spanning an epoch boundary: Gumbel-
    Softmax categorical heads with per-step noise SHARED between frameworks
    (derived from the step key, `derive_gumbel_noise`), categorical residual
    assembly, spectral-norm D, WGAN-style losses, hard-Gumbel cf probe.

    Tolerances are looser than moons (same spectral-norm D) because the
    tabular G amplifies f32 reduction noise harder: Gumbel-Softmax at
    tau=0.5 doubles logit deltas inside an exp, the CE term runs through a
    256-wide BN classifier, and the WGAN D loss is a difference of means
    with magnitude ~3e-3 (so absolute deltas look large relative to it).
    The measured 20-step trace FLUCTUATES without trending (g-delta peaks
    mid-run then shrinks 5x) — accumulation, not divergence; step-0
    agreement is pinned tighter by test_step_parity_tabular.py."""
    from cfgan.data.kc_house import KC_SCHEMA
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.testing import TabularCounterganOracle
    from cfgan.train.builders import build_tabular_countergan

    H, NB, B = 16, 2, 64
    cfg = CounterGANConfig(
        lr_g=1e-3, lr_d=1e-3, lambda_adv=1.0, lambda_cls=2.0,
        lambda_reg_l1=1.0, lambda_reg_l2=0.0, lambda_mask=1.0,
        resample_target=True, hidden_dim=H, num_res_blocks=NB,
        gumbel_tau=0.5,
    )
    schema = KC_SCHEMA
    clf_model = TabularClassifier()
    clf_state = NetState.create(
        clf_model.init(
            {"params": jax.random.key(1), "dropout": jax.random.key(1)},
            jnp.zeros((2, schema.input_dim)), train=False,
        ),
        adam_like_torch(1e-3),
    )
    bundle = build_tabular_countergan(
        cfg, clf_model, clf_state, schema, stats=None, seed=21,
        explicit_gumbel=True,
    )
    oracle = TabularCounterganOracle(bundle, clf_state, cfg, schema, None)

    rng = np.random.RandomState(3)
    n = B * 10
    x = rng.uniform(0, 1, (n, schema.input_dim)).astype(np.float32)
    y = rng.randint(0, 4, n)
    tr = run_parity_trace(
        bundle, oracle, x, y, epochs=2, batch_size=B, num_classes=4,
        resample_target=True, seed=17, max_steps=20,
        mask_fn=lambda k, xb: random_feature_mask(
            k, xb.shape[0], xb.shape[1], schema.immutable_idx
        ),
    )
    s = tr.summary()
    assert s["steps"] == 20
    assert s["d_delta_max"] < 5e-4, s
    assert s["g_delta_max"] < 5e-3, s
    assert s["param_drift_max_rel"] < 3e-2, s
    assert s["cf_eval_delta_max"] < 5e-2, s


@pytest.mark.slow
def test_mnist_multistep_parity():
    """~60 steps of the MNIST image pipeline (reduced width for CPU: CH=8,
    1 resblock, batch 16) spanning an epoch boundary: BCE adversarial
    losses, clamp epilogue, patch masks, BN-heavy conv generator."""
    CH, NRB, B = 8, 1, 16
    cfg = CounterGANConfig(
        lr_g=5e-5, lr_d=1e-5, lambda_adv=1.0, lambda_cls=1.0,
        lambda_reg_l1=2.5, lambda_reg_l2=0.0, lambda_mask=2.0,
        adv_loss="bce", reg_reduction="mean_abs", clamp_cf=(-1.0, 1.0),
        resample_target=False, num_res_blocks=NRB, hidden_dim=CH,
        mask=MaskConfig(kind="patch", patch_size=7,
                        num_modifiable_patches=10),
    )
    clf_model = CNNClassifier()
    clf_state = NetState.create(
        clf_model.init(jax.random.key(1), jnp.zeros((2, 28, 28, 1)),
                       train=False),
        adam_like_torch(1e-3),
    )
    bundle = build_mnist_countergan(cfg, clf_model, clf_state, seed=7)
    oracle = MnistCounterganOracle(bundle, clf_state, cfg)

    rng = np.random.RandomState(0)
    n = B * 32
    x = rng.uniform(-1, 1, (n, 28, 28, 1)).astype(np.float32)
    y = rng.randint(0, 10, n)
    tr = run_parity_trace(
        bundle, oracle, x, y, epochs=2, batch_size=B, num_classes=10,
        resample_target=False, seed=3, max_steps=60,
        mask_fn=lambda k, xb: random_patch_mask(
            k, xb.shape[0], (28, 28), 7, 10, channels=1
        ),
    )
    s = tr.summary()
    assert s["steps"] == 60
    assert s["d_delta_max"] < 1e-4, s
    assert s["g_delta_max"] < 1e-3, s
    assert s["param_drift_max_rel"] < 1e-3, s
    assert s["cf_eval_delta_max"] < 2e-2, s


@pytest.mark.slow
def test_tabular_endstate_distribution_parity():
    """Distribution-level equivalence PAST the chaos horizon: train the
    tabular pipeline in both frameworks with shared data order / Gumbel
    noise for a short-but-complete schedule, then compare the END-STATE
    per-target flip rates and gains of the trained generators (scored by
    the same frozen classifier).  This is the correct instrument where
    per-step tracing rightly fails (`results/parity/report.md`); the full
    5-epoch x 3-seed run lives in `tools/tabular_endstate_parity.py` /
    `results/parity/tabular_endstate.json`."""
    from cfgan.data.kc_house import KC_SCHEMA
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.testing import TabularCounterganOracle
    from cfgan.testing.endstate import (
        endstate_deltas,
        tabular_endstate_metrics,
    )
    from cfgan.train.builders import build_tabular_countergan

    H, NB, B = 16, 2, 64
    cfg = CounterGANConfig(
        lr_g=1e-3, lr_d=1e-3, lambda_adv=1.0, lambda_cls=2.0,
        lambda_reg_l1=1.0, lambda_reg_l2=0.0, lambda_mask=1.0,
        resample_target=True, hidden_dim=H, num_res_blocks=NB,
        gumbel_tau=0.5,
    )
    schema = KC_SCHEMA
    clf_model = TabularClassifier()
    clf_state = NetState.create(
        clf_model.init(
            {"params": jax.random.key(1), "dropout": jax.random.key(1)},
            jnp.zeros((2, schema.input_dim)), train=False,
        ),
        adam_like_torch(1e-3),
    )
    bundle = build_tabular_countergan(
        cfg, clf_model, clf_state, schema, stats=None, seed=23,
        explicit_gumbel=True,
    )
    oracle = TabularCounterganOracle(bundle, clf_state, cfg, schema, None)

    rng = np.random.RandomState(5)
    n = B * 20
    x = rng.uniform(0, 1, (n, schema.input_dim)).astype(np.float32)
    y = rng.randint(0, 4, n)
    _, state = run_parity_trace(
        bundle, oracle, x, y, epochs=3, batch_size=B, num_classes=4,
        resample_target=True, seed=19, max_steps=None, return_state=True,
        mask_fn=lambda k, xb: random_feature_mask(
            k, xb.shape[0], xb.shape[1], schema.immutable_idx
        ),
    )
    clf_vars = clf_state.variables()

    def clf_fn(xx):
        return clf_model.apply(clf_vars, xx, train=False)

    x_eval = rng.uniform(0, 1, (512, schema.input_dim)).astype(np.float32)
    rows = tabular_endstate_metrics(
        bundle, state, oracle, clf_fn, x_eval, schema, 4,
        jax.random.key(777),
    )
    d = endstate_deltas(rows)
    # 60 shared-noise steps: end-state distributions must agree tightly
    # (per-step losses at this horizon already fluctuate at the e-3 scale)
    assert d["flip_delta_max"] <= 0.03, d
    assert d["gain_delta_max"] <= 0.02, d
