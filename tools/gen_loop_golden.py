#!/usr/bin/env python
"""Regenerate the committed golden for the ``m4_loop_metrics`` oracle
(queries._M4_GOLDEN). Runs the seeded deterministic loop query at two
parallelism levels, asserts the rounded values agree (partition-order
independence), and prints the Python literal to paste into queries.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from bigdata_quality_assessment_spark import queries as Q
    from bigdata_quality_assessment_spark.session import build_session

    runs = []
    for master, parts in (("local[8]", 8), ("local[16]", 16)):
        spark = build_session(master=master, shuffle_partitions=parts)
        df = Q.queries()["m4_loop_metrics"](spark, SF_DIR)
        runs.append(
            [(r["pipeline"], r["iter"], r["metric"], r["value"]) for r in df.collect()]
        )
        spark.stop()
    assert runs[0] == runs[1], "loop metrics are parallelism-dependent — do NOT commit"
    print("_M4_GOLDEN: list[tuple[str, int, str, float]] = [")
    for p, i, k, v in runs[0]:
        print(f"    ({p!r}, {i}, {k!r}, {v!r}),")
    print("]")


if __name__ == "__main__":
    main()
