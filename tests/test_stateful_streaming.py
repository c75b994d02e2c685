"""applyInPandasWithState custom stateful operator (streaming)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from composable_logs_spark.streaming.stateful import running_user_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_running_user_totals_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "value"])
        spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode("append").parquet(
            str(src)
        )

    write_batch("b1", [(1, 1.25), (1, 2.00), (2, 10.00)])

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r["user_id"]: (r["n_events"], r["total_value_cents"])
            for r in spark.sql("select * from totals").collect()
        }
        assert first[1] == (2, 325)
        assert first[2] == (1, 1000)

        # second batch: state carries forward across micro-batches
        write_batch("b2", [(1, 0.75), (3, 5.50)])
        q.processAllAvailable()
        rows = spark.sql("select * from totals").collect()
        latest = {}
        for r in rows:  # memory sink appends updates; last write wins
            latest[r["user_id"]] = (r["n_events"], r["total_value_cents"])
        assert latest[1] == (3, 400)
        assert latest[3] == (1, 550)
    finally:
        q.stop()
