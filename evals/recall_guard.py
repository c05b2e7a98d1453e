"""Shared recall-regression guard (VERDICT r4 #7: the guard covered 4
of ~9 committed engine rows; the newest engines — exactly the ones most
likely to drift — were unguarded).

Every eval script that produces a committed recall row calls
check(key, recall) after measuring; a drop >0.002 below the committed
floor logs a REGRESSION line and the script exits 3 (same contract as
device_time.py). Floors live in expected_recall.json and are updated
ONLY alongside a RESULTS entry explaining the change.
"""

import json
import os
import sys

_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "expected_recall.json")


def check(key: str, recall: float, tol: float = 0.002) -> bool:
    """Returns True (and logs) when `recall` regresses the committed
    floor for `key`; unknown keys pass silently (new rows get a floor
    when first committed)."""
    with open(_PATH) as f:
        expected = {
            k: v for k, v in json.load(f).items() if not k.startswith("_")}
    exp = expected.get(key)
    if exp is not None and recall < exp - tol:
        print(
            f"RECALL REGRESSION {key}: {recall:.4f} < committed "
            f"{exp:.4f} - {tol}",
            file=sys.stderr, flush=True,
        )
        return True
    return False
