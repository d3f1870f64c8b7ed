#!/usr/bin/env python
"""Local mirror of the round driver's correctness gate: run every
``queries()`` entry at sf0.01 on Spark, run the matching
``oracle_sql()`` in DuckDB over views of the same parquet, and compare
rows / schema (column names) / values (column-name-sorted, row-sorted,
exact). Usage:

    python tools/check_correctness.py             # all queries
    python tools/check_correctness.py a11_kde t1_argmax
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _compare(s: pd.DataFrame, o: pd.DataFrame) -> tuple[bool, str]:
    if sorted(s.columns) != sorted(o.columns):
        return False, f"schema: spark={sorted(s.columns)} oracle={sorted(o.columns)}"
    if len(s) != len(o):
        return False, f"rows: spark={len(s)} oracle={len(o)}"
    s, o = _normalize(s), _normalize(o)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if pd.api.types.is_float_dtype(s[c]) or pd.api.types.is_float_dtype(o[c]):
            sv64 = sv.astype("float64")
            ov64 = ov.astype("float64")
            eq = (sv64 == ov64) | (np.isnan(sv64) & np.isnan(ov64))
            if not eq.all():
                bad = int((~eq).sum())
                with np.errstate(invalid="ignore"):
                    md = float(np.nanmax(np.abs(sv64 - ov64)))
                return False, f"values[{c}]: {bad} mismatches, max|Δ|={md:.3e}"
        else:
            if not (sv == ov).all():
                bad = int((sv != ov).sum())
                return False, f"values[{c}]: {bad} mismatches (non-float)"
    return True, "ok"


def main() -> int:
    import __spark_entry__ as E
    from bigdata_quality_assessment_spark.session import build_session

    only = set(sys.argv[1:])
    qs = E.queries()
    oracles = E.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    spark = build_session(master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        # spark-written tables (.localdata sf1/sf10 replicas) are
        # DIRECTORIES of part files — DuckDB needs the glob form
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark side raised")
            traceback.print_exc(limit=3)
            continue
        t_spark = time.perf_counter() - t0
        if name not in oracles:
            n_rows_only += 1
            print(f"rows  {name}: {len(sdf)} rows, {len(sdf.columns)} cols  [{t_spark:.1f}s]")
            continue
        t0 = time.perf_counter()
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: oracle raised: {str(exc)[:200]}")
            continue
        t_duck = time.perf_counter() - t0
        ok, msg = _compare(sdf, odf)
        if ok:
            n_pass += 1
            print(f"PASS  {name}: {len(sdf)} rows  [spark {t_spark:.1f}s, duck {t_duck:.1f}s]")
        else:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {msg}  [spark {t_spark:.1f}s, duck {t_duck:.1f}s]")
            # per-part attribution (round-10 verdict ask #7): several
            # registry entries pack 3-8 operator facets under one name
            # as a tagged union on a `part` column — localize the FAIL
            # to the offending part(s) instead of a union-wide verdict
            if "part" in sdf.columns and "part" in odf.columns:
                # null-safe sort: a NaN part on either side would make
                # sorted() raise TypeError on mixed float/str — crashing
                # the diagnosis path itself
                parts = sorted(
                    set(sdf["part"].unique()) | set(odf["part"].unique()),
                    key=lambda p: (p != p, str(p)),
                )
                for p in parts:
                    smask = sdf["part"].isna() if p != p else sdf["part"] == p
                    omask = odf["part"].isna() if p != p else odf["part"] == p
                    sp = sdf[smask].reset_index(drop=True)
                    op = odf[omask].reset_index(drop=True)
                    pok, pmsg = _compare(sp, op)
                    tag = "ok  " if pok else "BAD "
                    print(
                        f"      part {tag}{p}: {len(sp)}/{len(op)} rows"
                        + ("" if pok else f" — {pmsg}")
                    )

    print(
        f"\n== {n_pass} oracle-pass, {n_rows_only} rows-only, {n_fail} FAIL"
        + (f": {failures}" if failures else "")
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
