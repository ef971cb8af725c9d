"""The scale-evidence records are part of the repo's contract: every
committed SCALE_SWEEP*.json must be green (0 failures) and cited in
SCALE.md (r4 lesson — a stale/red evidence record is a red build even
while the unit and oracle suites stay green).  The same assertions run
in the verify recipe via scripts/check_scale_evidence.py; this test
keeps them inside `pytest tests/` so a red record can't be committed
quietly between verify runs.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_sweep_record_green_and_cited():
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts",
                                      "check_scale_evidence.py")],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_untagged_record_is_the_authoritative_full_sweep():
    rec = json.load(open(os.path.join(HERE, "SCALE_SWEEP.json")))
    # pre-r6 records predate the subset field; absent means full
    assert rec.get("subset", "full") == "full" and rec["all"] is True
    assert not rec["skipped"], (
        "the authoritative record must include the pair-emitters")


def test_seed_records_cover_full_registry():
    # seed-robustness sweeps (VERDICT r5 #3) rerun the FULL suite per
    # seeded fixture; a subset run would silently weaken the claim
    for path in glob.glob(os.path.join(HERE, "SCALE_SWEEP_seed*.json")):
        rec = json.load(open(path))
        assert rec["subset"] == "full" and rec["all"] is True, path
