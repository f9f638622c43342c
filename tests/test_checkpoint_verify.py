"""Committed reproduce-matrix checkpoints restore and evaluate at their
recorded level (round-4 verdict weak item 5: the snapshot/queue race
left the committed checkpoint evidence unverified).

Runs scripts/verify_checkpoints.py's verify+check path over a small
sample of committed checkpoints (full sweep: the script itself).
"""

import json
import os

import pytest

pytestmark = [pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(REPO, "runs/reproduce/results.jsonl")),
    reason="no committed reproduce results")
def test_sampled_checkpoints_restore_and_eval():
    import sys
    sys.path.insert(0, REPO)
    os.chdir(REPO)
    from scripts.verify_checkpoints import check, verify_rows

    rows = [json.loads(l)
            for l in open("runs/reproduce/results.jsonl")]
    # one cheap cell per experiment family
    sample = {"checkers_s1", "roadway_s1"}
    reports = verify_rows(rows, n_eval=32, cells_filter=sample,
                          verbose=False)
    assert reports, "no committed checkpoints found for sampled cells"
    fails = check(reports)
    assert not fails, fails
