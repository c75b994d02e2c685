"""_money2 / _money2_sql: the 2dp money-rounding helper must implement
EXACT half-away-from-zero integer rounding for every i64 sum — the
double-division version it replaced truncate-casts wrongly from 1e16
micro-units up (9999999999999999/10000 -> 1000000000000, off by one),
which is inside the 100 TB group-sum range."""

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from composable_logs_spark.queries.relational import _money2, _money2_sql


def _exact(v: int, divisor: int) -> float:
    step = divisor // 100
    sign = -1 if v < 0 else 1
    return sign * ((abs(v) + step // 2) // step) / 100.0


ADVERSARIAL = [
    9999999999999999, -9999999999999999, 99999999999999999,
    899999999999999999, 10**18 - 1, -(10**18) + 1, 0, 50, -50, 5000,
    15170689500, -15170689500,
]


def test_money2_spark_exact_on_adversarial_and_random(spark):
    import random

    rnd = random.Random(11)
    vals = ADVERSARIAL + [
        rnd.randrange(-9 * 10**17, 9 * 10**17) for _ in range(300)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for divisor in (100, 10000, 1000000):
        got = {
            r["v"]: r["m"]
            for r in df.select(
                "v", _money2(F.col("v"), divisor).alias("m")
            ).collect()
        }
        for v in vals:
            assert got[v] == _exact(v, divisor), (v, divisor)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(9 * 10**17), max_value=9 * 10**17))
def test_money2_sql_matches_exact(v):
    con = duckdb.connect()
    for divisor in (10000, 1000000):
        (got,) = con.execute(
            f"SELECT {_money2_sql(str(v), divisor)}"
        ).fetchone()
        assert got == _exact(v, divisor)
