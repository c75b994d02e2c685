"""Skew-handling join/aggregation utilities (SCALE.md; guide §Partitioning).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in the session factory);
these helpers cover the two patterns AQE cannot fix:

- ``salted_agg``: two-phase aggregation for a hot GROUP BY key — partial
  aggregate on (key, salt), then final aggregate on key. The first
  shuffle spreads a hot key over ``n_salts`` reducers.
- ``salted_join``: replicate the SMALL side per salt, salt the big side,
  join on (key, salt). For when the small side is too big to broadcast
  but the big side's key distribution is pathological.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate: groupBy(keys + salt) with ``partial_aggs``,
    then groupBy(keys) with ``final_aggs`` over the partial results.

    ``partial_aggs`` must alias columns that ``final_aggs`` consume, and
    the (partial, final) pair must form a decomposable aggregate
    (sum/sum, count/sum, min/min, max/max, …).
    """
    salted = df.withColumn("_salt", (F.spark_partition_id() % n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed ``key`` values: big rows get a
    random-ish salt (stable per partition), small rows are replicated
    once per salt value, and the join runs on (key, salt) so one hot key
    spreads across ``n_salts`` tasks."""
    big_salted = big.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    joined = big_salted.join(small_rep, [key, "_salt"], how)
    return joined.drop("_salt")
