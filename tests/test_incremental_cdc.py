"""Streaming CDC snapshot == batch apply-changes on the same changelog,
plus replay idempotence of the versioned state."""

from pyspark.sql import functions as F

from composable_logs_spark.queries import load
from composable_logs_spark.queries.cdc_q import apply_changes
from composable_logs_spark.streaming.incremental_cdc import CDCSnapshotSink


def _base_and_changes(spark, sf_dir):
    base = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )
    changes = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_custkey") % 97 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("new_bal_cents"),
    )
    return base, changes


def _snap_dict(df):
    return {r["key"]: r["bal_cents"] for r in df.collect()}


def test_stream_fold_matches_batch_apply(spark, tmp_path, sf_dir):
    base, changes = _base_and_changes(spark, sf_dir)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # split the changelog into two arrival waves BY SEQ ORDER (the CDC
    # ordering contract: cross-batch order is arrival order)
    cut = changes.agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY seq)")).first()[0]
    changes.where(F.col("seq") <= cut).coalesce(1).write.mode("append").parquet(src)

    sink = CDCSnapshotSink(spark, str(tmp_path / "state"), initial=base)
    stream = spark.readStream.schema(changes.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink.fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    changes.where(F.col("seq") > cut).coalesce(1).write.mode("append").parquet(src)
    q2 = (
        spark.readStream.schema(changes.schema)
        .parquet(src)
        .writeStream.foreachBatch(sink.fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    streamed = _snap_dict(sink.current_snapshot())
    batch = _snap_dict(apply_changes(base, changes).select("key", "bal_cents"))
    assert streamed == batch and len(batch) > 0


def test_replay_same_batch_id_is_idempotent(spark, tmp_path):
    base = spark.createDataFrame([(1, 100), (2, 200)], "key long, bal_cents long")
    sink = CDCSnapshotSink(spark, str(tmp_path / "state"), initial=base)
    b0 = spark.createDataFrame(
        [(1, 10, "U", 111), (3, 11, "U", 333)],
        "key long, seq long, op string, new_bal_cents long",
    )
    sink.fold(b0, 0)
    once = _snap_dict(sink.current_snapshot())
    sink.fold(b0, 0)  # restart replay of the SAME batch id
    assert _snap_dict(sink.current_snapshot()) == once == {1: 111, 2: 200, 3: 333}
