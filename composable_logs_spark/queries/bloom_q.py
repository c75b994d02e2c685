"""Bloom-pruned join query over ``operators/bloom.py``.

Revenue of lineitems belonging to URGENT orders, with the fact side
pruned by a bloom filter on the urgent orderkeys BEFORE the join.  The
final equi-join re-checks key equality, so bloom false positives cannot
change the result — the filter only cuts how many fact rows reach the
shuffle.  At 100 TB with a selective dim predicate this is the
difference between shuffling the whole fact table and shuffling the few
percent that can match (Spark's own InjectRuntimeFilter does the same,
but only when its heuristics fire; here it is explicit and testable).

The DuckDB oracle is the plain exact join — by construction the bloom
changes nothing semantically, which is exactly the property the gate
certifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load
from .relational import _money2, _money2_sql
from ..operators.bloom import bloom_build, bloom_prefilter

_N_BITS = 1 << 18
_K = 5


def bloom_pruned_urgent_revenue(spark: SparkSession, sf: str) -> DataFrame:
    urgent = load(spark, sf, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    filt = bloom_build(urgent.select("o_orderkey"), "o_orderkey", _N_BITS, _K)
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    pruned = bloom_prefilter(li, "l_orderkey", filt, _N_BITS, _K)
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_c = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        pruned.join(
            urgent.select("o_orderkey"),
            pruned["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            _money2(F.sum(price_c * (100 - disc_c)), 10000).alias("revenue"),
        )
    )


_SQL = f"""
SELECT l_returnflag,
       count(*) AS n_lines,
       {_money2_sql('sum(CAST(round(l_extendedprice * 100) AS BIGINT)'
                    ' * (100 - CAST(round(l_discount * 100) AS BIGINT)))', 10000)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
"""


QUERIES = {
    "bloom_pruned_urgent_revenue": QuerySpec(bloom_pruned_urgent_revenue, _SQL),
}
