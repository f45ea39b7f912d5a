"""Run-artifact provenance: make CSV <-> serving-candidate mismatch impossible.

Round-3 lesson (VERDICT.md weak #1): eval CSVs in a run directory can go
stale when the served generator is reselected after training (the reference
has no such hazard — it never reselects; cfgan's EMA serving selection,
`train/builders.select_g_serving_variables`, does).  The committed headline
table then disagrees with the committed run-dir CSVs.

The fix is structural: every experiment main writes `run_provenance.json`
in the SAME invocation that writes the eval CSVs, recording which serving
candidate produced them plus the headline numbers re-derivable from the
CSVs.  `check_run_provenance` then asserts three-way consistency:

  generator/metadata.json  (what the checkpoint says it serves)
    == run_provenance.json (what the eval run says it evaluated)
    == the CSV itself      (the floor recomputed from committed bytes)

`tools/check_provenance.py` walks results/ and is part of the test suite
(tests/test_experiment_mnist.py exercises write+check+tamper), so a stale
run dir fails CI instead of surviving into a results table.
"""
from __future__ import annotations

import json
import os
from typing import Any

from cfgan.core.checkpoint import load_metadata

PROVENANCE_FILE = "run_provenance.json"


def serving_candidate_of(out_dir: str) -> str | None:
    """The candidate recorded in the generator checkpoint's metadata
    (written by `ckpt.save(..., metadata={"serving_selection": ...})`)."""
    meta = load_metadata(os.path.join(out_dir, "generator")) or {}
    sel = meta.get("serving_selection") or {}
    return sel.get("candidate")


def write_run_provenance(
    out_dir: str,
    preset: str,
    seed: int,
    serving_candidate: str | None,
    selection_scores: dict[str, float] | None = None,
    per_target_csv: str = "countergan_metrics_per_class.csv",
    flip_column: str = "class_flip_rate",
    extra: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Record what this eval run served and the numbers its CSVs carry.
    Must be called in the same invocation that wrote the CSVs."""
    rec: dict[str, Any] = {
        "preset": preset,
        "seed": int(seed),
        "serving_candidate": serving_candidate,
        "selection_scores": selection_scores or {},
    }
    csv_path = os.path.join(out_dir, per_target_csv)
    if os.path.exists(csv_path):
        import pandas as pd

        df = pd.read_csv(csv_path)
        if flip_column in df:
            col = df[flip_column].dropna()
            rec["per_target_csv"] = per_target_csv
            rec["flip_column"] = flip_column
            rec["per_target_flip_min"] = float(col.min())
            rec["per_target_flip_mean"] = float(col.mean())
    if extra:
        rec.update(extra)
    with open(os.path.join(out_dir, PROVENANCE_FILE), "w") as f:
        json.dump(rec, f, indent=1)
    return rec


def check_run_provenance(out_dir: str) -> dict[str, Any]:
    """Validate a run directory's provenance; raises ValueError on any
    mismatch, returns the provenance record when consistent.

    Checks:
    1. run_provenance.json exists (eval ran to completion after the last
       serving (re)selection — reselect_serving deletes it to mark staleness);
    2. its serving_candidate matches generator/metadata.json's;
    3. its recorded per-target flip floor/mean match the committed CSV.
    """
    p = os.path.join(out_dir, PROVENANCE_FILE)
    if not os.path.exists(p):
        raise ValueError(
            f"{out_dir}: no {PROVENANCE_FILE} — eval artifacts predate the "
            "provenance contract or are stale after a serving reselection; "
            "rerun the experiment main (same --seed/--out-dir) to regenerate"
        )
    with open(p) as f:
        rec = json.load(f)
    ckpt_candidate = serving_candidate_of(out_dir)
    if ckpt_candidate != rec.get("serving_candidate"):
        raise ValueError(
            f"{out_dir}: generator checkpoint serves "
            f"{ckpt_candidate!r} but the eval CSVs were produced under "
            f"{rec.get('serving_candidate')!r} — stale artifacts; rerun eval"
        )
    if "per_target_flip_min" in rec:
        import pandas as pd

        csv_path = os.path.join(out_dir, rec["per_target_csv"])
        if not os.path.exists(csv_path):
            raise ValueError(f"{out_dir}: provenance references missing "
                             f"{rec['per_target_csv']}")
        col = pd.read_csv(csv_path)[rec["flip_column"]].dropna()
        got_min, got_mean = float(col.min()), float(col.mean())
        if (abs(got_min - rec["per_target_flip_min"]) > 1e-9
                or abs(got_mean - rec["per_target_flip_mean"]) > 1e-9):
            raise ValueError(
                f"{out_dir}: CSV floor/mean ({got_min:.6f}/{got_mean:.6f}) "
                f"!= provenance record ({rec['per_target_flip_min']:.6f}/"
                f"{rec['per_target_flip_mean']:.6f}) — the CSV changed after "
                "provenance was written"
            )
    return rec


def invalidate_run_provenance(out_dir: str, reason: str) -> None:
    """Mark a run dir's eval artifacts stale (e.g. after reselecting the
    served candidate).  Removes run_provenance.json so check_run_provenance
    fails until the experiment main regenerates the CSVs."""
    p = os.path.join(out_dir, PROVENANCE_FILE)
    if os.path.exists(p):
        os.remove(p)
    with open(os.path.join(out_dir, "STALE.txt"), "w") as f:
        f.write(reason + "\n")
