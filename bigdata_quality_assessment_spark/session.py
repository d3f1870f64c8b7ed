"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime shuffle-partition coalescing + skew-join handling), Arrow for
the few Pandas-UDF operators, UTC session timezone so results compare
bit-stable against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def resolved_extra_conf(extra_conf: dict[str, str] | None) -> dict[str, str]:
    """Merge the call-site ``extra_conf`` with the
    ``SPARK_GRAFT_EXTRA_CONF`` env JSON. The env var is applied LAST
    (round-14): it exists for diagnostic overrides without code edits
    — e.g. the Python-worker faulthandler when chasing a worker crash
    inside a full bench run — so it must win over any key a call site
    already pins, not silently lose to it. When it DOES override a
    call-site key, that is a real Spark-configuration change to an
    existing deployment, so each collision is warned once (round-15,
    ADVICE) — visible in the logs rather than silent."""
    merged: dict[str, str] = dict(extra_conf or {})
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        import json as _json

        for k, v in _json.loads(env_conf).items():
            v = str(v)
            if k in merged and merged[k] != v:
                import warnings

                warnings.warn(
                    f"SPARK_GRAFT_EXTRA_CONF overrides call-site Spark "
                    f"conf {k!r}: {merged[k]!r} -> {v!r}",
                    stacklevel=2,
                )
            merged[k] = v
    return merged


def build_session(
    app_name: str = "bigdata_quality_assessment_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if
    unset). ``shuffle_partitions`` defaults to the core count — the
    right size for local mode; on a real cluster it is raised to
    ~2-3× total executor cores and AQE coalesces from there.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = os.cpu_count() or 8 if cpus == "*" else int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # pinned explicitly (it is the default, but a regression here
        # re-pays the ~2-2.5 s/worker pandas-import cold start on EVERY
        # Arrow stage instead of once per executor — PLANS.md round-8
        # measured 117.8 s executor-time cold vs 18.9 s warm)
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    for k, v in resolved_extra_conf(extra_conf).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
