"""The engine's query surface, as (spark_fn, oracle_sql) pairs.

Each entry is one operator/query from SURVEY.md §2 (or a north-star
scale operator) expressed twice:

- a PySpark DataFrame program ``(spark, sf_dir) -> DataFrame``
- an equivalent ANSI-SQL string DuckDB can run over the same parquet
  views (or a VALUES-literal golden result for span-log queries whose
  fixtures are deterministic) — the driver hash-compares the two.

Column names and types are aligned on both sides; aggregates are rounded
(sums to 2dp, averages/ratios to 4dp) so double arithmetic-order
differences between engines can't flip the hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => non-SQL-expressible, rows-only check


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one testdata table.

    events.parquet stores TIMESTAMP(NANOS) which Spark only reads as a
    long with the legacy flag; normalise to a proper TimestampType (µs)
    here so every query sees the same schema regardless of how the
    driver built the session.
    """
    path = f"{sf_dir}/{table}.parquet"
    # pin UTC regardless of how the caller built the session: events.ts
    # becomes a session-TZ-sensitive TimestampType after the nanos
    # conversion, and date_format output must match the TZ-naive oracle
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # TIMESTAMP(NANOS) parquet columns are unreadable without the legacy
    # flag; setting it up-front is free (it only affects nanos columns)
    # and avoids paying a deliberately-failed Spark job to probe for them.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F, types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # integer division: epoch-nanos exceed double's 2^53 exact
            # range, so `/ 1000` (double) could be off by 1 µs vs DuckDB
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def all_queries() -> dict[str, QuerySpec]:
    # Registry order is a VERIFICATION SURFACE: the driver's correctness
    # gate checks the first 50 entries. Rounds 1-3 verified the modules
    # now at the back (relational/text/similarity/span*/dedup head), so
    # the previously-unchecked modules lead — keep new modules near the
    # front until a driver round has hash-checked them.
    from . import (
        tpch_full,
        asof_q,
        session_q,
        pipeline_q,
        graph_q,
        stats_q,
        bloom_q,
        multimodal_q,
        streaming_q,
        sketch_q,
        srp_lsh_q,
        tpch_extra,
        cluster_q,
        dedup_q,
        relational,
        text_ops,
        similarity_q,
        span_q,
        span_ops_q,
        corpus_q,
        hll_q,
        asof_extra_q,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (
        tpch_full,
        asof_q,
        session_q,
        pipeline_q,
        graph_q,
        stats_q,
        bloom_q,
        multimodal_q,
        streaming_q,
        sketch_q,
        srp_lsh_q,
        tpch_extra,
        cluster_q,
        dedup_q,
        relational,
        text_ops,
        similarity_q,
        span_q,
        span_ops_q,
        corpus_q,
        hll_q,
        asof_extra_q,
    ):
        out.update(mod.QUERIES)
    return out
