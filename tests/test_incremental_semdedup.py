"""Incremental SemDeDup (streaming/incremental_semdedup): new vectors
against a persisted kept index — duplicates of kept vectors dropped,
novel vectors kept and indexed, growing index across batches, replay
idempotence."""

from pyspark.sql import functions as F

from composable_logs_spark.streaming.incremental_semdedup import (
    init_semdedup_state,
    make_fold,
    stream_semdedup,
)


def _vec(direction, scale=1.0, dim=64):
    v = [0.0] * dim
    v[2 * direction] = scale
    v[2 * direction + 1] = 0.1 * (direction + 1) * scale
    return v


def _corpus(spark):
    # 8 base directions (k-means seeds) + one extra member per cell
    rows = [(i, _vec(i)) for i in range(8)]
    rows += [(100 + i, _vec(i, 1.002)) for i in range(8)]  # near-dups
    return spark.createDataFrame(rows, "vec_id long, vec array<double>")


def _flags(spark, out_dir):
    return {
        r["vec_id"]: r["dropped"]
        for r in spark.read.parquet(out_dir).collect()
    }


def test_stream_dedups_against_index_and_grows(spark, tmp_path):
    cents_dir = str(tmp_path / "cents")
    kept_dir = str(tmp_path / "kept")
    out_dir = str(tmp_path / "flags")
    init_semdedup_state(_corpus(spark), cents_dir, kept_dir)
    # initial keepers: one per (base, variant) pair
    kept0 = spark.read.parquet(kept_dir)
    assert kept0.count() == 8

    fold = make_fold(spark, cents_dir, kept_dir, out_dir)
    # batch 0: one dup of a kept vector, one novel direction mix
    novel = [0.0] * 64
    novel[1], novel[33] = 1.0, 1.0
    b0 = spark.createDataFrame(
        [(200, _vec(3, 0.999)), (201, novel)],
        "vec_id long, vec array<double>",
    )
    fold(b0, 0)
    f0 = _flags(spark, out_dir)
    assert f0[200] is True      # semantic dup of the kept direction-3 vector
    assert f0[201] is False     # novel: kept and indexed
    # batch 1: dup of the NOVEL vector kept in batch 0 (grown index)
    b1 = spark.createDataFrame(
        [(300, [x * 1.001 for x in novel])], "vec_id long, vec array<double>"
    )
    fold(b1, 1)
    f1 = _flags(spark, out_dir)
    assert f1[300] is True


def test_within_batch_duplicates_keep_exactly_one(spark, tmp_path):
    cents_dir = str(tmp_path / "cents")
    kept_dir = str(tmp_path / "kept")
    out_dir = str(tmp_path / "flags")
    init_semdedup_state(_corpus(spark), cents_dir, kept_dir)
    fold = make_fold(spark, cents_dir, kept_dir, out_dir)
    # three mutually-near vectors in a NOVEL direction, same batch
    novel = [0.0] * 64
    novel[5], novel[40] = 1.0, 0.7
    batch = spark.createDataFrame(
        [(400 + i, [x * (1 + 0.001 * i) for x in novel]) for i in range(3)],
        "vec_id long, vec array<double>",
    )
    fold(batch, 0)
    f = _flags(spark, out_dir)
    assert sorted(f) == [400, 401, 402]
    assert sum(1 for v in f.values() if not v) == 1  # exactly one kept


def test_replay_is_idempotent(spark, tmp_path):
    cents_dir = str(tmp_path / "cents")
    kept_dir = str(tmp_path / "kept")
    out_dir = str(tmp_path / "flags")
    init_semdedup_state(_corpus(spark), cents_dir, kept_dir)
    fold = make_fold(spark, cents_dir, kept_dir, out_dir)
    novel = [0.0] * 64
    novel[7], novel[50] = 1.0, 0.5
    batch = spark.createDataFrame(
        [(500, novel)], "vec_id long, vec array<double>"
    )
    fold(batch, 0)
    first = _flags(spark, out_dir)
    fold(batch, 0)  # replay: must not drop 500 against its own kept row
    second = _flags(spark, out_dir)
    assert first == second == {500: False}
    kept_rows = (
        spark.read.parquet(kept_dir).where(F.col("vec_id") == 500).count()
    )
    assert kept_rows == 1  # not duplicated by the replay


def test_streaming_end_to_end(spark, tmp_path):
    cents_dir = str(tmp_path / "cents")
    kept_dir = str(tmp_path / "kept")
    out_dir = str(tmp_path / "flags")
    init_semdedup_state(_corpus(spark), cents_dir, kept_dir)
    vecs_dir = str(tmp_path / "vecs")
    spark.createDataFrame(
        [(600, _vec(2, 1.001)), (601, _vec(6, 0.998))],
        "vec_id long, vec array<double>",
    ).coalesce(1).write.mode("append").parquet(vecs_dir)
    q = stream_semdedup(
        spark, vecs_dir, cents_dir, kept_dir, out_dir, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    f = _flags(spark, out_dir)
    assert f == {600: True, 601: True}  # both dup the initial keepers


def test_refresh_centroids_handles_drift(spark, tmp_path):
    """Drifted content: before a refresh, vectors in a novel direction
    all pile into one stale cell; after refresh_centroids the retrained
    cells separate them, the kept set is preserved exactly, and a
    duplicate of a drifted keeper is still dropped (replay guard
    intact across the refresh)."""
    from composable_logs_spark.streaming.incremental_semdedup import (
        refresh_centroids,
    )

    cents_dir = str(tmp_path / "cents")
    kept_dir = str(tmp_path / "kept")
    out_dir = str(tmp_path / "flags")
    init_semdedup_state(_corpus(spark), cents_dir, kept_dir)
    fold = make_fold(spark, cents_dir, kept_dir, out_dir)

    # drifted batch: 4 mutually-distant vectors in directions the
    # initial centroids never saw (high dims), all below tau pairwise
    def drifted(i):
        v = [0.0] * 64
        v[48 + 2 * i] = 1.0
        v[49 + 2 * i] = 0.3
        return v

    b0 = spark.createDataFrame(
        [(700 + i, drifted(i)) for i in range(4)],
        "vec_id long, vec array<double>",
    )
    fold(b0, 0)
    f0 = _flags(spark, out_dir)
    assert all(f0[700 + i] is False for i in range(4))  # novel: all kept
    stale_cells = {
        r["vec_id"]: r["cell"]
        for r in spark.read.parquet(kept_dir).collect()
    }
    # the drifted keepers piled into few stale cells
    n_stale = len({stale_cells[700 + i] for i in range(4)})

    before_ids = sorted(stale_cells)
    refresh_centroids(spark, cents_dir, kept_dir)
    refreshed = {
        r["vec_id"]: r["cell"]
        for r in spark.read.parquet(kept_dir).collect()
    }
    assert sorted(refreshed) == before_ids  # no keeper lost or added
    n_fresh = len({refreshed[700 + i] for i in range(4)})
    assert n_fresh >= n_stale  # retrained cells separate the drift
    assert n_fresh > 1

    # dedup still works across the refresh: a near-copy of a drifted
    # keeper must be dropped, a new novel direction kept
    novel = [0.0] * 64
    novel[11], novel[42] = 1.0, 1.0
    b1 = spark.createDataFrame(
        [(800, [x * 1.001 for x in drifted(2)]), (801, novel)],
        "vec_id long, vec array<double>",
    )
    fold(b1, 1)
    f1 = _flags(spark, out_dir)
    assert f1[800] is True and f1[801] is False

    # replay idempotence across the refresh boundary
    fold(b1, 1)
    assert _flags(spark, out_dir)[800] is True
    assert (
        spark.read.parquet(kept_dir).where(F.col("vec_id") == 801).count() == 1
    )
