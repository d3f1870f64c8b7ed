"""Declarative DQ expectations: hand-computed violation counts across
all rule kinds, null semantics, and the single-pass row-rule fold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.expectations import (
    check_expectations,
    in_range,
    in_set,
    matches,
    not_null,
    ref,
    sql_expr,
    unique,
)


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "a", 10.0, "US"),
        (2, "b", 200.0, "DE"),   # out of range
        (3, None, 30.0, "FR"),   # null name
        (3, "d", 40.0, "XX"),    # dup id, bad country
        (5, "e", None, "US"),    # null value -> range violation
    ]
    return spark.createDataFrame(rows, "id long, name string, v double, country string")


def test_check_expectations_counts(spark, table):
    dim = spark.createDataFrame([("US",), ("DE",), ("FR",)], "code string")
    rules = [
        not_null("name"),
        in_range("v", 0.0, 100.0),
        in_set("country", ["US", "DE", "FR"]),
        matches("name", "^[a-e]$"),
        sql_expr("id < 100", name="small_id"),
        unique("id"),
        ref("country", dim, "code"),
    ]
    out = {r.rule: (r.n_rows, r.n_violations, r.pass_rate)
           for r in check_expectations(table, rules).collect()}
    assert out["not_null(name)"] == (5, 1, 0.8)
    assert out["in_range(v,0.0,100.0)"] == (5, 2, 0.6)   # 200 + null
    assert out["in_set(country)"] == (5, 1, 0.8)
    assert out["matches(name)"] == (5, 1, 0.8)           # null violates
    assert out["small_id"] == (5, 0, 1.0)
    assert out["unique(id)"] == (5, 1, 0.8)              # one extra '3'
    assert out["ref(country)"] == (5, 1, 0.8)            # XX missing
    # rule order preserved
    order = [r.rule for r in check_expectations(table, rules).collect()]
    assert order == [e.name for e in rules]


def test_row_rules_fold_into_one_aggregate(table):
    rules = [not_null("name"), in_range("v", 0, 100), in_set("country", ["US"])]
    plan = (
        check_expectations(table, rules)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # no joins, no extra scans: all three rules ride one Aggregate
    assert "Join" not in plan
    assert plan.count("Aggregate") <= 2  # partial + final


def test_empty_frame_pass_rates(spark):
    empty = spark.createDataFrame([], "id long, name string")
    out = {r.rule: (r.n_rows, r.n_violations, r.pass_rate)
           for r in check_expectations(empty, [not_null("name"), unique("id")]).collect()}
    assert out["not_null(name)"] == (0, 0, 1.0)
    assert out["unique(id)"] == (0, 0, 1.0)


def test_unique_nulls_exempt_and_name_collisions(spark):
    df = spark.createDataFrame(
        [(None, "x"), (None, "y"), (1, "ab"), (1, "cd"), (2, "ef")],
        "k long, t string",
    )
    out = check_expectations(
        df,
        [
            unique("k"),
            # two auto-named matches rules on the SAME column: counts
            # must stay distinct per rule position
            matches("t", "^[a-z]{2}$"),
            matches("t", "^x$"),
        ],
    ).collect()
    by_pos = [(r.rule, r.n_violations) for r in out]
    assert by_pos[0] == ("unique(k)", 1)        # nulls exempt; dup '1' once
    assert by_pos[1] == ("matches(t)", 2)       # 'x','y' fail 2-letter rule
    assert by_pos[2] == ("matches(t)", 4)       # only 'x' passes ^x$


def test_enforce_expectations_split(spark, table):
    from bigdata_quality_assessment_spark.operators.expectations import (
        enforce_expectations,
    )

    rules = [not_null("name"), in_range("v", 0.0, 100.0), unique("id")]
    passing, quarantined = enforce_expectations(table, rules)
    # ids 2 (range), 3-null-name, 5 (null v) fail; unique is ignored
    assert sorted(r.id for r in passing.collect()) == [1, 3]
    q = {r.id: set(r._failed_rules) for r in quarantined.collect()}
    assert q[2] == {"in_range(v,0.0,100.0)"}
    assert q[5] == {"in_range(v,0.0,100.0)"}
    assert {"not_null(name)"} in q.values()
    # no-row-rules edge: everything passes, empty quarantine
    p2, q2 = enforce_expectations(table, [unique("id")])
    assert p2.count() == 5 and q2.count() == 0


def test_check_expectations_by_group(spark):
    from bigdata_quality_assessment_spark.operators.expectations import (
        check_expectations_by,
    )

    df = spark.createDataFrame(
        [
            ("a", 10.0), ("a", None), ("a", 20.0),
            ("b", 500.0), ("b", 30.0),
        ],
        "src string, v double",
    )
    out = {(r.src, r.rule): (r.n_rows, r.n_violations)
           for r in check_expectations_by(
               df, [not_null("v"), in_range("v", 0.0, 100.0)], "src"
           ).collect()}
    assert out[("a", "not_null(v)")] == (3, 1)
    assert out[("a", "in_range(v,0.0,100.0)")] == (3, 1)   # null violates
    assert out[("b", "not_null(v)")] == (2, 0)
    assert out[("b", "in_range(v,0.0,100.0)")] == (2, 1)   # 500
    with pytest.raises(ValueError):
        check_expectations_by(df, [unique("src")], "src")


def test_check_expectations_by_group_ref_skewed(spark):
    """Per-group referential integrity on a SKEWED group distribution
    (one feed holds ~95% of rows): counts are exact per group, groups
    with zero missing keys still report the rule with 0 violations,
    and the plan pin shows the anti-join is UNHINTED — no forced
    broadcast node from this operator; the join key is the reference
    key, so the hot group cannot concentrate a join partition."""
    from bigdata_quality_assessment_spark.operators.expectations import (
        check_expectations_by,
        not_null,
        ref,
    )

    rows = [("hot", i % 50) for i in range(950)]  # all keys valid
    rows += [("cold", 1), ("cold", 999), ("cold", 998)]  # 2 dangling
    df = spark.createDataFrame(rows, "src string, k int")
    dim = spark.createDataFrame([(i,) for i in range(50)], "id int")

    out = check_expectations_by(
        df, [not_null("k"), ref("k", dim, "id")], "src"
    )
    got = {(r.src, r.kind): (r.n_rows, r.n_violations) for r in out.collect()}
    assert got[("hot", "ref")] == (950, 0)
    assert got[("cold", "ref")] == (3, 2)
    assert got[("hot", "not_null")] == (950, 0)
    # plan pin: the operator must not force a broadcast — the hint
    # node would appear as ResolvedHint in the analyzed plan
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    # NULL keys are exempt from ref (consistent with table-level)
    df2 = spark.createDataFrame(
        [("a", None), ("a", 7)], "src string, k int"
    )
    got2 = {(r.src, r.kind): r.n_violations for r in check_expectations_by(
        df2, [ref("k", dim, "id")], "src").collect()}
    assert got2[("a", "ref")] == 0


def test_check_expectations_by_group_ref_null_group(spark):
    """A NULL group key is a real feed (rows with no source tag): its
    missing-key count must join back null-safely — a plain equi-join
    would silently zero-fill the NULL group's violations."""
    from bigdata_quality_assessment_spark.operators.expectations import (
        check_expectations_by,
        ref,
    )

    df = spark.createDataFrame(
        [(None, 999), (None, 1), ("a", 998), ("a", 2)],
        "src string, k int",
    )
    dim = spark.createDataFrame([(i,) for i in range(50)], "id int")
    got = {r.src: (r.n_rows, r.n_violations) for r in check_expectations_by(
        df, [ref("k", dim, "id")], "src").collect()}
    assert got[None] == (2, 1)
    assert got["a"] == (2, 1)
