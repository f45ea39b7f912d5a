"""Tests for cfgan.migrate: importing the reference's committed torch
checkpoints and reproducing its committed eval numbers with cfgan's stack.

These are the strongest functional-parity pins in the suite: no training is
involved — the reference's own trained weights run through cfgan's
models/eval and must land on the reference's own committed CSV values.
Skipped when the read-only reference checkout is not present.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/conditional_counteRGAN"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/moons/results/generator.pt"),
    reason="reference checkout not available",
)


def test_all_importers_match_model_trees():
    """Every importer produces exactly the structure + shapes of the
    corresponding cfgan model's init tree."""
    from cfgan import migrate
    from cfgan.data.kc_house import KC_SCHEMA
    from cfgan.models.classifiers import (
        LegacyCNNClassifier,
        MLPClassifier,
        TabularClassifier,
    )
    from cfgan.models.generators import (
        ImageResidualGenerator,
        MoonsResidualGenerator,
        TabularResidualGenerator,
    )

    k = {"params": jax.random.key(0), "gumbel": jax.random.key(1)}

    g = TabularResidualGenerator(
        input_dim=17, hidden_dim=32, num_classes=4,
        continuous_idx=KC_SCHEMA.continuous_idx,
        categorical_info=KC_SCHEMA.categorical_info, n_blocks=5)
    tpl = g.init(k, jnp.zeros((2, 17)), jnp.zeros((2, 4)),
                 jnp.ones((2, 17)), train=False)
    migrate.validate_against(
        migrate.import_house_generator(
            f"{REF}/house_sales_kc_usa/generator_model.pt"),
        {n: tpl[n] for n in ("params", "batch_stats")}, "house G")

    tpl = TabularClassifier().init(jax.random.key(0), jnp.zeros((2, 17)),
                                   train=False)
    migrate.validate_against(
        migrate.import_house_classifier(
            f"{REF}/house_sales_kc_usa/clf_model.pt"),
        {n: tpl[n] for n in ("params", "batch_stats")}, "house clf")

    tpl = MoonsResidualGenerator().init(
        jax.random.key(0), jnp.zeros((2, 2)), jnp.zeros((2, 3)),
        jnp.ones((2, 2)), train=False)
    migrate.validate_against(
        migrate.import_moons_generator(f"{REF}/moons/results/generator.pt"),
        {n: tpl[n] for n in ("params", "batch_stats")}, "moons G")

    tpl = MLPClassifier().init(jax.random.key(0), jnp.zeros((2, 2)))
    migrate.validate_against(
        migrate.import_moons_classifier(
            f"{REF}/moons/results/classifier.pt"),
        {"params": tpl["params"]}, "moons clf")

    tpl = ImageResidualGenerator().init(
        jax.random.key(0), jnp.zeros((1, 28, 28, 1)),
        jnp.zeros((1,), "int32"), jnp.ones((1, 28, 28, 1)), train=False)
    migrate.validate_against(
        migrate.import_mnist_generator(f"{REF}/mnist/results/generator.pt"),
        {n: tpl[n] for n in ("params", "batch_stats")}, "mnist G")

    tpl = LegacyCNNClassifier().init(jax.random.key(0),
                                     jnp.zeros((1, 28, 28, 1)))
    migrate.validate_against(
        migrate.import_mnist_legacy_classifier(
            f"{REF}/mnist/models/classifier.pt"),
        {"params": tpl["params"]}, "legacy clf")


def test_validate_against_reports_mismatches():
    from cfgan import migrate

    tpl = {"params": {"a": np.zeros((2, 3)), "b": np.zeros((4,))}}
    with pytest.raises(ValueError, match="missing leaf"):
        migrate.validate_against({"params": {"a": np.zeros((2, 3))}}, tpl)
    with pytest.raises(ValueError, match="shape mismatch"):
        migrate.validate_against(
            {"params": {"a": np.zeros((3, 2)), "b": np.zeros((4,))}}, tpl)
    with pytest.raises(ValueError, match="unexpected leaf"):
        migrate.validate_against(
            {"params": {"a": np.zeros((2, 3)), "b": np.zeros((4,)),
                        "c": np.zeros((1,))}}, tpl)


def test_moons_imported_weights_reproduce_committed_metrics():
    """The imported reference moons classifier+generator, run through
    cfgan's deterministic eval forward on bit-identically regenerated
    data, must reproduce the committed confusion matrix EXACTLY and the
    committed metrics_all_masks.csv 'both' rows to the f32 floor."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from reference_weights_eval import (
        REF_MOONS_CONFUSION,
        REF_MOONS_METRICS,
        run_moons,
    )

    res = run_moons(os.environ.get("PYTEST_TMP", "/tmp"))
    assert res["confusion_exact"], (
        f"confusion {res['confusion']} != committed {REF_MOONS_CONFUSION}")
    # 1e-6 is ~30x the observed 3e-8 floor, far below the ~3e-2 spread
    # between the reference's own two committed runs
    assert res["max_metric_delta"] < 1e-6, res["max_metric_delta"]
    for t, row in enumerate(res["metrics"]):
        assert abs(row["class_flip"]
                   - REF_MOONS_METRICS["class_flip"][t]) < 1e-6


def test_house_imported_classifier_exact_committed_accuracy():
    """The imported house classifier on the real CSV with the reference's
    seed-42 split reproduces the committed 0.7046 accuracy exactly
    (deterministic forward; `house results/classifier_eval/
    classifier_report.txt:2`)."""
    from cfgan import migrate
    from cfgan.data.kc_house import load_kc_house
    from cfgan.models.classifiers import TabularClassifier

    if not os.path.exists(
            f"{REF}/house_sales_kc_usa/kc_house_data.csv"):
        pytest.skip("real kc_house CSV not available")

    _, (xte, yte), stats, bins, schema = load_kc_house()
    clf_model = TabularClassifier()
    clf_vars = migrate.import_house_classifier(
        f"{REF}/house_sales_kc_usa/clf_model.pt")
    lg = clf_model.apply(dict(clf_vars), jnp.asarray(xte), train=False)
    acc = float((np.asarray(jnp.argmax(lg, 1)) == np.asarray(yte)).mean())
    assert abs(acc - 0.7046) < 5e-5, acc


def test_mnist_generator_import_numeric_forward_parity():
    """Numeric pin for the CONV import path (square 3x3 kernels would let a
    wrong permute hide behind matching shapes): the imported flax generator
    must match the eager-torch mirror loaded with the same reference
    state_dict, eval mode (BN running stats), to the f32 floor."""
    import torch

    from cfgan import migrate
    from cfgan.models.generators import ImageResidualGenerator
    from cfgan.testing.oracles import TorchMnistG

    sd = torch.load(f"{REF}/mnist/results/generator.pt",
                    map_location="cpu", weights_only=True)
    tg = TorchMnistG(ch=64, nrb=6)
    rename = {"embed": "emb", "conv_in": "cin", "conv_mid": "mid",
              "conv_out": "out"}
    tsd = {}
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue
        if k.startswith("resblocks."):
            _, i, layer, leaf = k.split(".")
            short = {"conv1": "c1", "bn1": "b1", "conv2": "c2",
                     "bn2": "b2"}[layer]
            tsd[f"blocks.{i}.{short}.{leaf}"] = v
        else:
            head, leaf = k.split(".", 1)
            tsd[f"{rename[head]}.{leaf}"] = v
    tg.load_state_dict(tsd)
    tg.eval()

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (4, 28, 28, 1)).astype(np.float32)
    t = np.array([3, 1, 4, 1], np.int32)
    m = (rng.uniform(0, 1, (4, 28, 28, 1)) > 0.5).astype(np.float32)

    with torch.no_grad():
        raw_t, masked_t = tg(
            torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t, dtype=torch.long),
            torch.tensor(m).permute(0, 3, 1, 2))
    g_vars = migrate.import_mnist_generator(f"{REF}/mnist/results/generator.pt")
    raw_j, masked_j = ImageResidualGenerator().apply(
        dict(g_vars), jnp.asarray(x), jnp.asarray(t), jnp.asarray(m),
        train=False)
    delta = np.abs(np.asarray(raw_j)
                   - raw_t.permute(0, 2, 3, 1).numpy()).max()
    assert delta < 1e-5, delta
    delta_m = np.abs(np.asarray(masked_j)
                     - masked_t.permute(0, 2, 3, 1).numpy()).max()
    assert delta_m < 1e-5, delta_m


def test_mnist_legacy_classifier_import_numeric_forward_parity():
    """The legacy classifier import permutes the post-flatten Linear from
    the reference's NCHW flatten order to cfgan's NHWC; logits must match
    an eager-torch replica of the reference module exactly."""
    import torch
    import torch.nn.functional as F
    from torch import nn as tnn

    from cfgan import migrate
    from cfgan.models.classifiers import LegacyCNNClassifier

    sd = torch.load(f"{REF}/mnist/models/classifier.pt",
                    map_location="cpu", weights_only=True)

    class RefLegacy(tnn.Module):
        """`mnist/modules/classifier.py:4-30` semantics: NCHW flatten."""

        def __init__(self):
            super().__init__()
            self.c1 = tnn.Conv2d(1, 32, 3, padding=1)
            self.c2 = tnn.Conv2d(32, 64, 3, padding=1)
            self.f1 = tnn.Linear(64 * 7 * 7, 128)
            self.f2 = tnn.Linear(128, 10)

        def forward(self, x):
            h = F.max_pool2d(F.relu(self.c1(x)), 2)
            h = F.max_pool2d(F.relu(self.c2(h)), 2)
            h = h.reshape(h.shape[0], -1)  # NCHW flatten like the reference
            return self.f2(F.relu(self.f1(h)))

    tm = RefLegacy()
    tm.load_state_dict({
        "c1.weight": sd["net.0.weight"], "c1.bias": sd["net.0.bias"],
        "c2.weight": sd["net.3.weight"], "c2.bias": sd["net.3.bias"],
        "f1.weight": sd["net.7.weight"], "f1.bias": sd["net.7.bias"],
        "f2.weight": sd["net.9.weight"], "f2.bias": sd["net.9.bias"],
    })
    tm.eval()

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (4, 28, 28, 1)).astype(np.float32)
    with torch.no_grad():
        lg_t = tm(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    c_vars = migrate.import_mnist_legacy_classifier(
        f"{REF}/mnist/models/classifier.pt")
    lg_j = np.asarray(LegacyCNNClassifier().apply(dict(c_vars),
                                                  jnp.asarray(x)))
    assert np.abs(lg_j - lg_t).max() < 1e-5, np.abs(lg_j - lg_t).max()
