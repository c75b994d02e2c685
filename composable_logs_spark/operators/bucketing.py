"""Bucketed-table utilities: shuffle-free co-located joins (guide:
Partitioning & shuffle; SCALE.md).

Writing both sides of a hot join bucketed by the join key means every
subsequent join on that key is exchange-free — THE structural
optimisation for repeated large joins at 100 TB (pay one shuffle at
write time, never again).

Local note: bucketed tables require ``saveAsTable`` (a warehouse
catalog); the session's default local warehouse works for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst sees
    compatible output partitioning and plans a SortMergeJoin with NO
    Exchange on either side (verify with .explain)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
