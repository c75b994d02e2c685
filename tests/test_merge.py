"""MERGE/upsert/SCD2 emulation tests."""

import datetime

from pyspark.sql import functions as F

from composable_logs_spark.operators.merge import (
    merge_dedup_latest,
    merge_upsert,
    scd2_apply,
)


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )
    source = spark.createDataFrame([(2, "B"), (4, "D")], "id long, val string")
    out = {r["id"]: r["val"] for r in merge_upsert(target, source, ["id"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_dedup_latest(spark):
    log = spark.createDataFrame(
        [(1, "v1", 1), (1, "v2", 2), (2, "x", 5), (2, "old", 3)],
        "id long, val string, version long",
    )
    out = {r["id"]: r["val"] for r in merge_dedup_latest(log, ["id"], "version").collect()}
    assert out == {1: "v2", 2: "x"}


def test_scd2_apply(spark):
    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [
            (1, "alpha", t0, None, True),
            (2, "beta", t0, None, True),
            (3, "gamma-old", t0, t0, False),
            (3, "gamma", t0, None, True),
        ],
        "id long, val string, effective_from timestamp, effective_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "ALPHA", t1)], "id long, val string, effective_from timestamp"
    )
    out = scd2_apply(dim, changes, ["id"])
    rows = sorted(
        ((r["id"], r["val"], r["is_current"], r["effective_to"]) for r in out.collect())
    )
    assert rows == sorted(
        [
            (1, "alpha", False, t1),   # closed out
            (1, "ALPHA", True, None),  # new current version
            (2, "beta", True, None),   # untouched
            (3, "gamma-old", False, t0),
            (3, "gamma", True, None),
        ]
    )
    # history preserved: two versions of id=1
    assert out.where(F.col("id") == 1).count() == 2


def test_scd2_two_changes_same_key_in_one_batch_chain_into_history(spark):
    # two intra-batch changes for one key CHAIN: the pre-existing current
    # row closes at the first change, the first change closes at the
    # second (lead() within the key), only the last is current
    dim = spark.createDataFrame(
        [("k1", "v0", "2020-01-01 00:00:00", None, True)],
        "id string, val string, effective_from string, effective_to string, is_current boolean",
    ).select(
        "id", "val",
        F.to_timestamp("effective_from").alias("effective_from"),
        F.to_timestamp("effective_to").alias("effective_to"),
        "is_current",
    )
    changes = spark.createDataFrame(
        [("k1", "v1", "2021-01-01 00:00:00"), ("k1", "v2", "2022-01-01 00:00:00")],
        "id string, val string, effective_from string",
    ).select("id", "val", F.to_timestamp("effective_from").alias("effective_from"))

    out = scd2_apply(dim, changes, ["id"]).collect()
    t21 = datetime.datetime(2021, 1, 1)
    t22 = datetime.datetime(2022, 1, 1)
    rows = sorted((r["val"], r["effective_to"], r["is_current"]) for r in out)
    assert rows == [
        ("v0", t21, False),   # old current closed at first change
        ("v1", t22, False),   # intermediate version chained, not dropped
        ("v2", None, True),   # last change is the one current row
    ]
    # exactly one current row per key
    assert sum(r["is_current"] for r in out) == 1
