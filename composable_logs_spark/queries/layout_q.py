"""Z-order data layout — the lakehouse table-maintenance op (Delta
OPTIMIZE ZORDER BY, Iceberg sort orders): rewrite a table so that rows
close in a MULTI-dimensional key space land in the same file, making
per-file min/max statistics selective for predicates on EITHER
dimension, instead of only the leading sort key.

The reference has no storage-layout surface (north-star scope — this is
the op a 100 TB lakehouse runs nightly so that the other 172 queries
scan less).

Mechanics, all exact integer arithmetic in both engines:

1. Bucketize the two layout dimensions to 8 bits each
   (``l_partkey % 256``, ``l_suppkey % 256``).
2. ``zval`` = bit interleave (Morton code) of the two bucket values —
   16 terms of shift/mask/or, expressible as one native expression
   (no UDF).
3. Assign each row to one of 32 "files" under two layouts:
   *linear* = high 5 bits of the partkey bucket (a single-column sort),
   *zorder* = high 5 bits of the Morton code (which fixes 3 high
   partkey bits AND 2 high suppkey bits per file).
4. Emit per-(layout, file) skipping statistics: row count and min/max
   of each dimension — exactly the footer stats a scan planner prunes
   on. ``pk_span``/``sk_span`` = number of equality probes on that
   dimension a planner could NOT skip the file for; under *linear*,
   pk_span is tight (8) and sk_span is the full domain (~256); under
   *zorder* BOTH are bounded (32 / 64) — the multi-dimensional
   workload wins the layout buys.

100 TB design: the rewrite itself is one ``repartitionByRange`` on
``zval`` (a single shuffle, the same cost as any sort-based OPTIMIZE);
the statistics pass is a map-side-combinable groupBy on (layout,
file_id). Nothing here is quadratic and nothing needs a UDF; the
Morton expression is whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_BITS = 8
_FILE_BITS = 5  # 32 files
_N_FILES = 1 << _FILE_BITS


def _morton_expr(pk: str, sk: str) -> str:
    """SQL expression interleaving two _BITS-bit ints: pk bit b ->
    output bit 2b+1, sk bit b -> output bit 2b (identical text works in
    Spark SQL and DuckDB)."""
    terms = []
    for b in range(_BITS):
        terms.append(f"((({pk} >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"((({sk} >> {b}) & 1) << {2 * b})")
    return " + ".join(terms)


def zorder_layout_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        (F.col("l_partkey") % 256).cast("int").alias("pk"),
        (F.col("l_suppkey") % 256).cast("int").alias("sk"),
    )
    zval = F.expr(_morton_expr("pk", "sk"))
    both = li.withColumn("zval", zval).select(
        "pk",
        "sk",
        F.explode(
            F.array(
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.shiftright(F.col("pk"), _BITS - _FILE_BITS).alias("file_id"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(F.col("zval"), 2 * _BITS - _FILE_BITS).alias(
                        "file_id"
                    ),
                ),
            )
        ).alias("a"),
    )
    stats = (
        both.groupBy(F.col("a.layout").alias("layout"), F.col("a.file_id").alias("file_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("pk").alias("pk_min"),
            F.max("pk").alias("pk_max"),
            F.min("sk").alias("sk_min"),
            F.max("sk").alias("sk_max"),
        )
        .withColumn("pk_span", (F.col("pk_max") - F.col("pk_min") + 1).cast("int"))
        .withColumn("sk_span", (F.col("sk_max") - F.col("sk_min") + 1).cast("int"))
        .orderBy("layout", "file_id")
    )
    return stats


_ZORDER_SQL = f"""
WITH li AS (
  SELECT CAST(l_partkey % 256 AS INT) AS pk,
         CAST(l_suppkey % 256 AS INT) AS sk
  FROM lineitem
),
z AS (
  SELECT pk, sk, {_morton_expr("pk", "sk")} AS zval FROM li
),
both_layouts AS (
  SELECT 'linear' AS layout, pk >> {_BITS - _FILE_BITS} AS file_id, pk, sk FROM z
  UNION ALL
  SELECT 'zorder' AS layout, zval >> {2 * _BITS - _FILE_BITS} AS file_id, pk, sk FROM z
)
SELECT layout, CAST(file_id AS INT) AS file_id,
       COUNT(*) AS n_rows,
       MIN(pk) AS pk_min, MAX(pk) AS pk_max,
       MIN(sk) AS sk_min, MAX(sk) AS sk_max,
       CAST(MAX(pk) - MIN(pk) + 1 AS INT) AS pk_span,
       CAST(MAX(sk) - MIN(sk) + 1 AS INT) AS sk_span
FROM both_layouts
GROUP BY layout, file_id
ORDER BY layout, file_id
"""


QUERIES = {
    "zorder_layout_lineitem": QuerySpec(zorder_layout_lineitem, _ZORDER_SQL),
}
