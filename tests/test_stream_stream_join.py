"""Watermarked stream-stream interval join: micro-batched stream result
must equal the one-shot batch join over the same rows."""

import pandas as pd
from pyspark.sql import types as T

from composable_logs_spark.streaming.joins import interval_join_streams

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _write(spark, path, rows):
    pdf = pd.DataFrame(
        [(u, pd.Timestamp(ts)) for u, ts in rows], columns=["user_id", "ts"]
    )
    spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(path)
    )


def test_stream_interval_join_equals_batch(spark, tmp_path):
    clicks_dir = tmp_path / "clicks"
    purchases_dir = tmp_path / "purchases"
    ckpt = tmp_path / "ckpt"

    clicks_b1 = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:20:00"),
        (2, "2024-01-01 10:05:00"),
        (3, "2024-01-01 09:00:00"),  # too old for u3's purchase (>30 min)
    ]
    purchases_b1 = [
        (1, "2024-01-01 10:25:00"),  # matches both u1 clicks
        (3, "2024-01-01 10:00:00"),  # no click within 30 min
    ]
    _write(spark, clicks_dir, clicks_b1)
    _write(spark, purchases_dir, purchases_b1)

    cs = spark.readStream.schema(SCHEMA).parquet(str(clicks_dir))
    ps = spark.readStream.schema(SCHEMA).parquet(str(purchases_dir))
    q = (
        interval_join_streams(cs, ps)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sjoin")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch arrives later: purchase for u2 joins the u2 click
        # delivered in batch 1 — state must have been retained
        purchases_b2 = [(2, "2024-01-01 10:30:00")]
        _write(spark, purchases_dir, purchases_b2)
        q.processAllAvailable()
        got = {
            (r["user_id"], str(r["click_ts"]), str(r["purchase_ts"]), r["lag_us"])
            for r in spark.sql("select * from sjoin").collect()
        }
    finally:
        q.stop()

    batch = interval_join_streams(
        spark.read.schema(SCHEMA).parquet(str(clicks_dir)),
        spark.read.schema(SCHEMA).parquet(str(purchases_dir)),
    )
    want = {
        (r["user_id"], str(r["click_ts"]), str(r["purchase_ts"]), r["lag_us"])
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == 3  # u1 x2 + u2 x1; u3 unmatched


def test_interval_join_on_ntz_parquet_events(spark, sf_dir):
    """PySpark 4.x reads the testdata's timestamp[us] parquet as
    TIMESTAMP_NTZ; the join's lag computation must survive that (the
    unix_micros-on-raw-NTZ analysis error, ADVICE r4)."""
    from composable_logs_spark.queries import load
    from pyspark.sql import functions as F

    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select("user_id", "ts")
    out = interval_join_streams(clicks, purchases, max_lag_s=3600)
    rows = out.limit(50).collect()
    assert rows, "expected at least one click-before-purchase pair"
    assert all(0 <= r["lag_us"] <= 3600 * 1_000_000 for r in rows)


def test_stream_interval_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: a purchase with no qualifying
    click must emit with null click columns once the watermark passes
    its match window. A later batch of far-future rows advances the
    watermark to flush the unmatched row."""
    clicks_dir = tmp_path / "clicks"
    purchases_dir = tmp_path / "purchases"
    ckpt = tmp_path / "ckpt"

    _write(spark, clicks_dir, [(1, "2024-01-01 10:00:00")])
    _write(
        spark,
        purchases_dir,
        [
            (1, "2024-01-01 10:05:00"),  # matched
            (9, "2024-01-01 10:10:00"),  # no click ever -> null row
        ],
    )

    cs = spark.readStream.schema(SCHEMA).parquet(str(clicks_dir))
    ps = spark.readStream.schema(SCHEMA).parquet(str(purchases_dir))
    q = (
        interval_join_streams(cs, ps, max_lag_s=1800, watermark_s=600, how="left_outer")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ljoin")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark is still at batch-1 max(ts) - 600 s: the unmatched
        # purchase cannot have been emitted yet
        early = {r["user_id"] for r in spark.sql("select * from ljoin").collect()}
        assert 9 not in early
        # far-future rows on BOTH sides push the watermark past
        # 10:10:00 + max_lag + delay, releasing the unmatched purchase
        _write(spark, clicks_dir, [(7, "2024-01-01 13:00:00")])
        _write(spark, purchases_dir, [(7, "2024-01-01 13:00:01")])
        q.processAllAvailable()
        q.processAllAvailable()
        rows = {
            (r["user_id"], r["click_ts"] is None, str(r["purchase_ts"]))
            for r in spark.sql("select * from ljoin").collect()
        }
    finally:
        q.stop()

    assert (1, False, "2024-01-01 10:05:00") in rows  # matched pair intact
    assert (9, True, "2024-01-01 10:10:00") in rows  # null-click emission
