"""Tabular eval suite: fused all-target sweep, immutability invariant,
report artifacts (feature shift, class-pair sensitivity, case studies)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgan.core.config import ClassifierConfig, CounterGANConfig
from cfgan.data.kc_house import load_kc_house
from cfgan.eval.tabular import (
    case_study_report,
    class_pair_sensitivity,
    feature_shift_importance,
    immutable_mask,
    per_target_metrics_from_sweep,
    sweep_all_targets,
)
from cfgan.models.classifiers import TabularClassifier
from cfgan.train.builders import build_tabular_countergan
from cfgan.train.classifier import train_classifier


@pytest.fixture(scope="module")
def house_setup():
    (xtr, ytr), (xte, yte), stats, bins, schema = load_kc_house(seed=0)
    xtr, ytr = xtr[:512], ytr[:512]
    xte, yte = xte[:128], yte[:128]
    clf_model = TabularClassifier(num_classes=4)
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(arch="tabular", lr=1e-3, epochs=1,
                                    batch_size=128),
        (xtr, ytr), seed=1, num_classes=4,
    )
    bundle = build_tabular_countergan(
        CounterGANConfig(epochs=1, hidden_dim=16, num_res_blocks=2),
        clf_model, clf_state, schema, stats, num_classes=4, seed=2,
    )

    def clf_fn(x):
        return clf_model.apply(clf_state.variables(), x, train=False)

    mask = immutable_mask(len(yte), schema)
    sweep = sweep_all_targets(
        bundle.cf_fn, clf_fn, bundle.state.g.variables(), xte, mask, 4,
        jax.random.key(0),
    )
    return sweep, xte, yte, schema, stats


def test_sweep_shapes(house_setup):
    sweep, xte, yte, schema, stats = house_setup
    B, D = xte.shape
    assert sweep["x_cf"].shape == (4, B, D)
    assert sweep["preds_cf"].shape == (4, B)
    assert sweep["probs_cf"].shape == (4, B, 4)
    assert sweep["probs_orig"].shape == (B, 4)


def test_immutable_features_unchanged(house_setup):
    """THE tabular contract: immutable features never move
    (house eval_utils.py:49-51)."""
    sweep, xte, yte, schema, stats = house_setup
    for t in range(4):
        delta = sweep["x_cf"][t] - xte
        imm = np.abs(delta[:, list(schema.immutable_idx)])
        np.testing.assert_allclose(imm, 0.0, atol=1e-7)


def test_counterfactuals_clamped_to_data_space(house_setup):
    sweep, *_ = house_setup
    assert sweep["x_cf"].min() >= 0.0 and sweep["x_cf"].max() <= 1.0


def test_categorical_features_land_on_legal_values(house_setup):
    """Hard Gumbel at eval: x_cf categorical entries must equal a legal
    normalized category value (tabular residual assembly,
    house trainer.py:272-279)."""
    sweep, xte, yte, schema, stats = house_setup
    from cfgan.models.tabular import build_cat_norm_values

    cat_vals = build_cat_norm_values(schema.categorical_info, stats)
    for fidx, legal in cat_vals.items():
        vals = sweep["x_cf"][:, :, fidx].ravel()
        # mutable categorical features only (masked ones may stay put, which
        # is also legal because originals are legal values)
        dist = np.min(np.abs(vals[:, None] - np.asarray(legal)[None]), axis=1)
        orig = np.tile(xte[:, fidx], 4)
        dist_orig = np.abs(vals - orig)
        assert np.all(np.minimum(dist, dist_orig) < 1e-4), fidx


def test_per_target_metrics_excludes_same_class(house_setup):
    sweep, xte, yte, schema, stats = house_setup
    df = per_target_metrics_from_sweep(sweep, xte, yte, 4)
    assert list(df.columns) == ["target_class", "class_flip_rate",
                                "prediction_gain", "avg_actionability"]
    assert len(df) == 4
    assert df["class_flip_rate"].between(0, 1).all()


def test_report_artifacts(house_setup, tmp_path):
    sweep, xte, yte, schema, stats = house_setup
    out = str(tmp_path)
    fs = feature_shift_importance(sweep, xte, yte, schema, stats, out_dir=out)
    assert os.path.exists(os.path.join(out, "feature_shift_importance.png"))
    # immutable features have zero shift
    for f in schema.immutable_features:
        assert fs.loc[fs.feature == f, "mean_abs_shift_normalized"].item() == 0

    cp = class_pair_sensitivity(sweep, xte, yte, schema, out_dir=out)
    assert {"source", "target", "feature"} <= set(cp.columns)
    assert os.path.exists(
        os.path.join(out, "class_pair_sensitivity", "src0.png")
    )

    cs = case_study_report(sweep, xte, yte, schema, stats,
                           out_dir=os.path.join(out, "cs"), n_samples=5)
    assert len(cs) == 5
    assert os.path.exists(
        os.path.join(out, "cs", "case_study_aggregate_summary.csv")
    )
    sample_dirs = os.listdir(os.path.join(out, "cs", "samples"))
    assert len(sample_dirs) >= 1


def test_mask_policy_analysis(house_setup, tmp_path):
    """Mask-policy sweep: right policy set, immutables never modifiable."""
    from cfgan.core.config import CounterGANConfig
    from cfgan.eval.mask_analysis import analyze_mask_policies
    from cfgan.train.builders import build_tabular_countergan
    from cfgan.data.kc_house import load_kc_house
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.train.state import NetState, adam_like_torch

    (xtr, ytr), (xte, yte), stats, bins, schema = load_kc_house(seed=0)
    clf_model = TabularClassifier(num_classes=4)
    clf_state = NetState.create(
        clf_model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)},
            jnp.asarray(xte[:2]),
        ),
        adam_like_torch(1e-3),
    )
    bundle = build_tabular_countergan(
        CounterGANConfig(hidden_dim=16, num_res_blocks=1),
        clf_model, clf_state, schema, stats, num_classes=4, seed=3,
    )

    def clf_fn(x):
        return clf_model.apply(clf_state.variables(), x, train=False)

    df = analyze_mask_policies(
        bundle.cf_fn, clf_fn, bundle.state.g.variables(),
        xte[:64], yte[:64], schema, 4, out_dir=str(tmp_path),
        max_samples=64,
    )
    n_mutable = len(schema.feature_names) - len(schema.immutable_features)
    assert set(df["policy"]).issuperset({"all_mutable", "random_half"})
    assert len(df) == (2 + n_mutable + 1) * 4
    singles = df[df["policy"].str.startswith("single:")]
    assert (singles["n_modifiable"] == 1).all()
    assert not any(
        f"single:{f}" in set(df["policy"]) for f in schema.immutable_features
    )
    assert os.path.exists(tmp_path / "mask_policy_analysis.csv")
    assert os.path.exists(tmp_path / "mask_policy_analysis.png")
