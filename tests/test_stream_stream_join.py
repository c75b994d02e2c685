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
