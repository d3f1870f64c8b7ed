"""Sources: testdata parquet readers and deterministic generators.

The reference has no file I/O — all of its sources are in-memory numpy
generators (SURVEY.md §2.1). Here they become DataFrame generators
(``spark.range``-based, fully distributed) plus parquet readers over
the driver test tables.
"""

from bigdata_quality_assessment_spark.sources.generators import (
    grid_points_2d,
    latin_hypercube,
    ou_process,
    stub_predictions,
    uniform_samples,
)
from bigdata_quality_assessment_spark.sources.tables import TABLES, load_table, load_tables
from bigdata_quality_assessment_spark.sources.textgen import (
    eval_spans,
    realistic_documents,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "grid_points_2d",
    "latin_hypercube",
    "ou_process",
    "stub_predictions",
    "uniform_samples",
    "eval_spans",
    "realistic_documents",
]
