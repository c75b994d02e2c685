"""Partitioned dataset writer: hive layout, bounded files-per-value,
round-trip fidelity."""

from pyspark.sql import functions as F

from composable_logs_spark.queries import load
from composable_logs_spark.sinks.dataset import read_dataset, write_dataset


def test_partitioned_write_layout_and_roundtrip(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    out = tmp_path / "corpus"
    write_dataset(
        docs,
        out,
        partition_by=["lang"],
        sort_by=["doc_id"],
        files_per_value=2,
        mode="overwrite",
    )

    part_dirs = sorted(p.name for p in out.iterdir() if p.name.startswith("lang="))
    langs = sorted(r["lang"] for r in docs.select("lang").distinct().collect())
    assert part_dirs == [f"lang={l}" for l in langs]

    # files-per-value is bounded by the salt, not by upstream task count
    for p in out.iterdir():
        if p.name.startswith("lang="):
            files = list(p.glob("*.parquet"))
            assert 1 <= len(files) <= 2, (p.name, files)

    back = read_dataset(spark, out)
    assert back.count() == docs.count()
    # partition column survives the round trip with its values intact
    assert sorted(r["lang"] for r in back.select("lang").distinct().collect()) == langs


def test_compaction_bounds_file_count(spark, sf_dir, tmp_path):
    from composable_logs_spark.sinks.dataset import compact_dataset

    docs = load(spark, sf_dir, "documents")
    out = tmp_path / "corpus"
    # simulate per-batch appends: many small files in each partition dir
    for _ in range(3):
        docs.repartition(4).write.mode("append").partitionBy("lang").parquet(str(out))
    before = {
        p.name: len(list(p.glob("*.parquet")))
        for p in out.iterdir()
        if p.name.startswith("lang=")
    }
    assert max(before.values()) > 1

    n_rows = spark.read.parquet(str(out)).count()
    compact_dataset(spark, out, partition_by=["lang"], files_per_value=1)

    after = {
        p.name: len(list(p.glob("*.parquet")))
        for p in out.iterdir()
        if p.name.startswith("lang=")
    }
    assert set(after) == set(before)
    assert all(n == 1 for n in after.values()), after
    assert spark.read.parquet(str(out)).count() == n_rows


def test_global_sorted_export(spark, sf_dir, tmp_path):
    """repartitionByRange export: every file internally sorted AND file
    ranges non-overlapping -> concatenating files in range order is a
    total sort, with no single-task bottleneck."""
    docs = load(spark, sf_dir, "documents")
    out = tmp_path / "sorted"
    write_dataset(docs, out, global_sort_by=["doc_id"], num_shards=4)

    files = sorted(out.glob("part-*.parquet"))
    assert len(files) > 1
    per_file = []
    for f in files:
        ids = [r["doc_id"] for r in spark.read.parquet(str(f)).collect()]
        assert ids == sorted(ids)  # sorted within file
        if ids:
            per_file.append((min(ids), max(ids)))
    per_file.sort()
    for (lo1, hi1), (lo2, hi2) in zip(per_file, per_file[1:]):
        assert hi1 < lo2  # ranges don't overlap -> global order
    total = sum(
        len(spark.read.parquet(str(f)).collect()) for f in files
    )
    assert total == docs.count()


def test_zorder_key_matches_reference(spark):
    from composable_logs_spark.sinks.dataset import zorder_key

    def py_z(a, b, bits=16):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    rows = [(a, b) for a in (0, 1, 7, 255, 65535) for b in (0, 3, 128, 65535)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", zorder_key(["a", "b"])
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    assert got == {(a, b): py_z(a, b) for a, b in rows}


def test_zorder_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    """Writing sorted by the z-key must tighten per-file min/max ranges
    on BOTH dimensions vs an unsorted write — the statistic parquet
    readers use to skip row groups."""
    import pyarrow.parquet as pq

    from composable_logs_spark.queries import load
    from composable_logs_spark.sinks.dataset import zorder_key

    e = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 1024).alias("u"),
        (F.hour("ts") * 60 + F.minute("ts")).alias("m"),
    )
    plain, zed = tmp_path / "plain", tmp_path / "zed"
    e.repartition(8).write.parquet(str(plain))
    (
        e.repartitionByRange(8, zorder_key(["u", "m"]))
        .sortWithinPartitions(zorder_key(["u", "m"]))
        .write.parquet(str(zed))
    )

    def avg_area(path):
        areas = []
        for f in path.glob("part-*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                su = md.row_group(rg).column(names["u"]).statistics
                sm = md.row_group(rg).column(names["m"]).statistics
                if su and sm and su.has_min_max and sm.has_min_max:
                    areas.append((su.max - su.min + 1) * (sm.max - sm.min + 1))
        return sum(areas) / len(areas)

    # the (u x m) bounding box per row group shrinks: that area is what a
    # two-predicate scan prunes on. 2x is a conservative floor (observed
    # ~8x here; the per-axis split depends on the axes' cardinalities —
    # the curve spends its bits on whichever dimension has more range)
    assert avg_area(zed) * 2 < avg_area(plain)


def test_partition_pruning_on_readback(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    out = tmp_path / "corpus"
    write_dataset(docs, out, partition_by=["lang"], mode="overwrite")
    one = read_dataset(spark, out).where("lang = 'en'")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the lang predicate must land in PartitionFilters (pruned dirs),
    # not a post-scan Filter over all partitions
    assert "PartitionFilters: [" in plan
    assert "lang" in plan.split("PartitionFilters:")[1][:200]
