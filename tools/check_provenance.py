"""Validate eval-artifact provenance across all committed run directories.

Walks `results/` for run dirs that carry a `generator/` checkpoint with a
serving-selection record, and asserts each one's eval CSVs were produced
under the candidate the checkpoint actually serves
(`cfgan.core.provenance.check_run_provenance` three-way check).  Run dirs
predating the provenance contract are listed as LEGACY (warn) unless
--strict.

Usage: python tools/check_provenance.py [--results results] [--strict]
Exit 0 = all consistent; 1 = at least one stale/mismatched dir.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cfgan.core.provenance import (  # noqa: E402
    PROVENANCE_FILE,
    check_run_provenance,
    serving_candidate_of,
)


def find_run_dirs(root: str) -> list[str]:
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        if os.path.isdir(os.path.join(dirpath, "generator")):
            out.append(dirpath)
    return sorted(out)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results", default="results")
    ap.add_argument("--strict", action="store_true",
                    help="fail dirs that predate the provenance contract")
    args = ap.parse_args()

    failures = 0
    for run in find_run_dirs(args.results):
        if serving_candidate_of(run) is None and not os.path.exists(
                os.path.join(run, PROVENANCE_FILE)):
            # no selection record at all (non-selected family, e.g. plain
            # GAN presets) — nothing to cross-check
            print(f"  n/a    {run} (no serving-selection record)")
            continue
        try:
            rec = check_run_provenance(run)
            print(f"  ok     {run}: candidate={rec['serving_candidate']!r} "
                  f"floor={rec.get('per_target_flip_min')}")
        except ValueError as e:
            if not os.path.exists(os.path.join(run, PROVENANCE_FILE)) \
                    and not args.strict:
                print(f"  LEGACY {run} (predates provenance contract)")
                continue
            failures += 1
            print(f"  FAIL   {e}")
    print(f"check_provenance: {failures} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
