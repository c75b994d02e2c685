import json

import pytest

from composable_logs_spark.session import get_spark
from composable_logs_spark.spanlog.schema import SPAN_SCHEMA


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


def spans_df(spark, span_dicts):
    """Load a list of span dicts through the JSON path (same code path as
    file ingest)."""
    lines = [json.dumps(s) for s in span_dicts]
    return spark.read.schema(SPAN_SCHEMA).json(
        spark.sparkContext.parallelize(lines, 2)
    )
