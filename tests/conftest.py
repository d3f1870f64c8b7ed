from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from bigdata_quality_assessment_spark.session import build_session

    s = build_session(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def grid20(spark):
    from bigdata_quality_assessment_spark.sources.generators import grid_points_2d

    df = grid_points_2d(spark, 20).cache()
    df.count()
    return df
