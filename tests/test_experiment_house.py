"""End-to-end smoke of the house experiment `run()` at tiny widths:
classifier pretrain -> tabular CounteRGAN -> both-protocol eval CSVs ->
case-study tree -> provenance record (house eval contract,
`house_sales_kc_usa/main.py` + `eval_utils.py:673-728`)."""
import os

import pandas as pd
import pytest

from cfgan.core.config import replace as cfg_replace


@pytest.mark.slow
def test_house_experiment_end_to_end(tmp_path):
    from cfgan.core.provenance import check_run_provenance
    from cfgan.experiments.house_countergan import run
    from cfgan.experiments.presets import HOUSE_COUNTERGAN

    cfg = HOUSE_COUNTERGAN.replace(
        seed=7,
        classifier=cfg_replace(HOUSE_COUNTERGAN.classifier, epochs=2),
        countergan=cfg_replace(
            HOUSE_COUNTERGAN.countergan,
            epochs=2, hidden_dim=16, num_res_blocks=1,
        ),
    )
    out = str(tmp_path / "run")
    run(cfg, out_dir=out, limit=600)

    for f in ("classifier", "generator", "loss_curves.png",
              "countergan_metrics.csv",
              "countergan_metrics_reference_protocol.csv",
              "feature_shift_importance.csv", "case_studies",
              "mask_policy_analysis.csv"):
        assert os.path.exists(os.path.join(out, f)), f

    df = pd.read_csv(os.path.join(out, "countergan_metrics.csv"))
    assert len(df) == 4 and "class_flip_rate" in df

    rec = check_run_provenance(out)
    # the default preset ships an epoch-snapshot serving candidate
    # (snapshot_every > 0) selected from {live, ema_recal_train/ones}
    assert rec["serving_candidate"].startswith("snapshot_e")
    sel = rec["selection_scores"]
    assert rec["serving_candidate"] in sel
    assert rec["preset"] == cfg.name and rec["seed"] == 7
    assert rec["per_target_flip_min"] == pytest.approx(
        float(df["class_flip_rate"].min()))

    # skip-if-exists rerun: no retrain, provenance refreshed consistently
    mtime = os.path.getmtime(
        os.path.join(out, "generator", "checkpoint.msgpack"))
    run(cfg, out_dir=out, limit=600)
    assert os.path.getmtime(
        os.path.join(out, "generator", "checkpoint.msgpack")) == mtime
    check_run_provenance(out)
