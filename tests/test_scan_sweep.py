"""The registry-wide FileScan-budget sweep as a pytest (round-10
verdict ask #1): round 9 proved the standalone tool gets skipped under
end-of-round pressure — two late registry widenings shipped past stale
budgets. Running it in the suite makes a widening that exceeds its
entry's scan budget a TEST FAILURE, not a forgotten tool run.

Budgets live in tools/scan_sweep.py (single source of truth), each >1
budget with its written justification. ~2-3 min at sf0.001 on the
shared session — the price of keeping the perf gate structural.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


def test_registry_scan_budgets_hold(spark):
    import scan_sweep

    bad = scan_sweep.sweep(spark, "/root/testdata/sf0.001", verbose=False)
    assert not bad, (
        "registry queries over their FileScan budget (fuse the rescans "
        f"or re-pin tools/scan_sweep.py with justification): {bad}"
    )
