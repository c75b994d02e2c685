"""Partitioned parquet dataset writer — the bulk-export path for
pipeline outputs (deduped corpora, scored documents, span tables).

The driver-side sinks (`directory`, `static_data`, `mermaid`) mirror the
reference's per-run summary exports, which are small by construction
(reference: ``static_builder/write.py`` builds one JSON tree per run).
This writer is the complement for the 100 TB side of the house, where
layout decides whether downstream reads prune or scan:

- ``partition_by`` maps to hive-style directory partitioning, so readers
  filtering on those columns get partition PRUNING (files never opened).
- ``files_per_value`` fights the small-files problem: without a
  pre-write repartition, EVERY upstream task writes one file into every
  partition directory it sees rows for (tasks x values files — the
  classic way a 1000-executor job makes a million tiny files). We
  repartition on (partition columns + a salt in [0, files_per_value)),
  so each partition value lands in exactly ``files_per_value`` tasks =
  that many files, independent of upstream parallelism; the salt also
  spreads one giant partition value across writers.
- ``sort_by`` sorts within files, so min/max parquet column statistics
  become selective and row-group skipping works for range predicates.
- ``max_records_per_file`` caps file size without an extra shuffle.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__write_salt"


def write_dataset(
    df: DataFrame,
    path: str | Path,
    partition_by: Sequence[str] = (),
    sort_by: Sequence[str] = (),
    files_per_value: Optional[int] = None,
    max_records_per_file: Optional[int] = None,
    mode: str = "overwrite",
    global_sort_by: Sequence[str] = (),
    num_shards: Optional[int] = None,
) -> None:
    """See module docstring. ``global_sort_by`` (with ``num_shards``)
    produces a TOTALLY ordered export: ``repartitionByRange`` samples the
    key distribution and cuts balanced, ORDERED ranges (shard k's keys all
    precede shard k+1's), then each shard sorts internally — a full sort
    at shuffle cost without funnelling rows through one task. The shape
    for reproducible training shards and for merge-friendly sorted runs.
    Mutually exclusive with ``partition_by``.
    """
    if global_sort_by:
        if partition_by:
            raise ValueError("global_sort_by is exclusive with partition_by")
        out = df.repartitionByRange(
            num_shards or df.sparkSession.sparkContext.defaultParallelism,
            *global_sort_by,
        ).sortWithinPartitions(*global_sort_by)
        writer = out.write.mode(mode)
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
        writer.parquet(str(path))
        return
    out = df
    salted = False
    if partition_by and files_per_value:
        # salt from the JSON rendering of the whole row: deterministic,
        # and valid for ANY schema (hash() itself rejects MAP columns)
        out = out.withColumn(
            _SALT,
            F.pmod(
                F.hash(F.to_json(F.struct(*[F.col(c) for c in df.columns]))),
                F.lit(files_per_value),
            ),
        ).repartition(*partition_by, _SALT)
        salted = True
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    if salted:
        out = out.drop(_SALT)
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(path))


def read_dataset(spark, path: str | Path) -> DataFrame:
    return spark.read.parquet(str(path))


def zorder_key(cols, bits: int = 16):
    """Interleave the low ``bits`` of each (non-negative integer) column
    into one long — the Z-order curve key.

    Sorting a write by this key (``repartitionByRange(zkey)`` +
    ``sort_by=[zkey]``) clusters rows that are close in EVERY dimension
    into the same files/row groups, so parquet min/max stats prune reads
    for predicates on any prefix-free combination of the dimensions —
    the standard trick when a table is filtered by two+ columns and
    hive-partitioning by either alone would leave the other unselective.
    Callers bucketize raw values into [0, 2**bits) first.

    Static expression (bits x n_cols bitwise ops), whole-stage codegen,
    zero shuffle by itself.
    """
    from pyspark.sql import functions as FF

    n = len(cols)
    out = FF.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = (
                FF.shiftright(FF.col(c) if isinstance(c, str) else c, i)
                .cast("long")
                .bitwiseAND(FF.lit(1).cast("long"))
            )
            out = out.bitwiseOR(FF.shiftleft(bit, i * n + j))
    return out


def compact_dataset(
    spark,
    path: str | Path,
    partition_by: Sequence[str] = (),
    files_per_value: int = 1,
    sort_by: Sequence[str] = (),
) -> None:
    """Small-files compaction (the OPTIMIZE step): rewrite a dataset's
    many small files into ``files_per_value`` files per partition value.

    Long-running ingest (e.g. the incremental-dedup index, or any
    per-micro-batch append) accretes one file per batch; reads then pay
    per-file open/footer costs that dwarf the data. Compaction is the
    standard fix, run periodically out-of-band.

    Spark cannot overwrite a path it is reading, so this writes to a
    sibling temp dir and swaps via rename. The swap is not atomic for
    concurrent readers — pause readers or use a transactional table
    format (Delta/Iceberg) when that matters; this utility is the plain-
    parquet fallback.
    """
    import shutil

    src = Path(path)
    tmp = src.with_name(src.name + ".compacting")
    df = spark.read.parquet(str(src))
    if partition_by:
        write_dataset(
            df,
            tmp,
            partition_by=partition_by,
            sort_by=sort_by,
            files_per_value=files_per_value,
            mode="overwrite",
        )
    else:
        # unpartitioned: bound total file count directly
        out = df.coalesce(files_per_value)
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
        out.write.mode("overwrite").parquet(str(tmp))
    shutil.rmtree(src)
    tmp.rename(src)
