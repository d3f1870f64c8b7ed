"""Counter-based (hash) RNG: the partition-invariant random stream.

``F.rand(seed)`` / ``F.randn(seed)`` derive their stream from the
PARTITION index — the same query returns different values when the
input split count changes (a file is compacted, AQE coalesces, a
cluster resizes).  At 100 TB that makes every "seeded" sampler
non-reproducible in exactly the situations that matter.  A counter RNG
instead derives each variate from a pure hash of ``(tag, row identity,
stream index)``: the value is a function of the ROW, not of the
physical plan, so results are bit-identical across partitionings,
retries, and engines.

The hash is the first 52 bits (13 hex chars) of ``md5`` over a
colon-joined key — chosen because ``md5`` is available verbatim in
Spark, DuckDB and ``hashlib``, which makes every sampler built on it
ORACLE-GRADABLE (the DuckDB twin recomputes the identical stream) and
lets ``applyInPandas`` recurrences (the OU process) share the stream
with SQL.  52 bits so the integer is exact in a double; uniforms are
``(h + 0.5) / 2^52`` ∈ (0, 1) — never 0 or 1, safe under ``log``.
Division by a power of two is exact in IEEE 754, so the uniform is
bit-identical in all three engines (the DuckDB twin must CAST its
literals to DOUBLE — bare decimals are DECIMAL there).

Normals are Box-Muller: ``sqrt(-2 ln u1) · cos(2π u2)`` with the two
uniforms drawn from sub-streams ``…:1`` / ``…:2``.  ``ln``/``cos``
differ by ≤ a few ulp between the JVM and DuckDB's vectorized libm, so
oracle comparisons of normal-derived columns go through the registry's
standard ``round(·, 6)``; uniforms and the underlying 52-bit integers
match exactly and are the preferred join/sort keys.

Reference parity: the reference seeds ``np.random`` globally
(core/inputs.py:54-69, SDE_forecast_ActiveSampling.py:23-43); the
counter stream replaces numpy's sequential PCG with an order-free
stream of the same distributions.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO52 = 4503599627370496.0  # 2^52, exact in a double


def _key(parts: tuple) -> Column:
    cols = [
        p.cast("string") if isinstance(p, Column) else F.lit(str(p))
        for p in parts
    ]
    return F.concat_ws(":", *cols)


def counter_hash(*parts) -> Column:
    """52-bit BIGINT hash of the colon-joined parts (columns or
    literals). DuckDB twin: ``('0x' || substring(md5(k),1,13))::BIGINT``."""
    return F.conv(F.substring(F.md5(_key(parts)), 1, 13), 16, 10).cast("bigint")


def counter_uniform(*parts) -> Column:
    """Uniform double in (0, 1), bit-identical across engines.
    DuckDB twin: ``(h + CAST(0.5 AS DOUBLE)) / CAST(4503599627370496.0
    AS DOUBLE)``."""
    return (counter_hash(*parts) + F.lit(0.5)) / F.lit(TWO52)


def counter_gaussian(*parts) -> Column:
    """Standard normal via Box-Muller over sub-streams ``…:1``/``…:2``.
    Compare oracle-side at round(·, 6) (libm ulp differences)."""
    u1 = counter_uniform(*parts, 1)
    u2 = counter_uniform(*parts, 2)
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)


# ------------------------- python twins ------------------------------
# Used inside applyInPandas recurrences (the OU process) so the pandas
# side draws the SAME stream the SQL side would.

def py_counter_hash(*parts) -> int:
    key = ":".join(str(p) for p in parts).encode()
    return int(hashlib.md5(key).hexdigest()[:13], 16)


def py_counter_uniform(*parts) -> float:
    return (py_counter_hash(*parts) + 0.5) / TWO52


def py_counter_gaussian(*parts) -> float:
    u1 = py_counter_uniform(*parts, 1)
    u2 = py_counter_uniform(*parts, 2)
    return math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)


# -------------------------- SQL twins --------------------------------
# Emit the DuckDB-side expression strings for oracle construction, so
# the stream definition lives in exactly one module.

def sql_counter_hash(key_sql: str) -> str:
    """DuckDB expression for counter_hash over an SQL string expr."""
    return f"('0x' || substring(md5({key_sql}),1,13))::BIGINT"


def sql_counter_uniform(key_sql: str) -> str:
    h = sql_counter_hash(key_sql)
    return f"(({h} + CAST(0.5 AS DOUBLE)) / CAST({TWO52!r} AS DOUBLE))"


def sql_counter_gaussian(key_sql: str) -> str:
    u1 = sql_counter_uniform(f"{key_sql} || ':1'")
    u2 = sql_counter_uniform(f"{key_sql} || ':2'")
    return f"(sqrt(-2.0 * ln({u1})) * cos(2.0 * pi() * {u2}))"
