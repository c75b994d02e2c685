"""Streaming trigram-LM scoring: stream==batch micro-nat equality
against a persisted static model, across micro-batches that exercise
all three backoff rungs plus OOV, and restart replay idempotence."""

from pyspark.sql import functions as F

from composable_logs_spark.queries import load
from composable_logs_spark.queries.trigram_q import trigram_doc_scores
from composable_logs_spark.streaming.incremental_trigram import (
    build_lm_index,
    start_scoring_stream,
)

_SENT = "the quick brown fox jumps over the lazy dog"


def _rows(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _write(spark, docs_dir, rows):
    _rows(spark, rows).coalesce(1).write.mode("append").parquet(str(docs_dir))


def test_stream_scores_match_batch(spark, sf_dir, tmp_path):
    """Real-corpus model (the trigram_logprob split), arriving docs
    scored per batch == the batch operator on the same (train, scored)
    frames — exact lp_sum_micro equality."""
    docs_dir = tmp_path / "incoming"
    index_dir = tmp_path / "lm_index"
    ckpt = tmp_path / "ckpt"
    docs_dir.mkdir()

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    train = d.where(F.col("doc_id") % 10 != 0)
    arriving = d.where(F.col("doc_id") % 10 == 0)
    build_lm_index(train, str(index_dir))

    # two files => two micro-batches
    half = arriving.where(F.col("doc_id") % 20 == 0)
    rest = arriving.where(F.col("doc_id") % 20 != 0)
    half.coalesce(1).write.mode("append").parquet(str(docs_dir))

    got = []
    q = start_scoring_stream(
        spark,
        str(docs_dir),
        str(index_dir),
        lambda df, bid: got.extend(df.collect()),
        str(ckpt),
    )
    try:
        q.processAllAvailable()
        rest.coalesce(1).write.mode("append").parquet(str(docs_dir))
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {r["doc_id"]: (r["n_trigrams"], r["lp_sum_micro"]) for r in got}
    expected = {
        r["doc_id"]: (r["n_trigrams"], r["lp_sum_micro"])
        for r in trigram_doc_scores(train, arriving).collect()
    }
    assert streamed == expected
    assert len(streamed) > 0


def test_backoff_rungs_and_replay(spark, tmp_path):
    """Planted batches exercise rung 1 (seen trigrams), rung 2 (unseen
    trigram / seen bigram), and the OOV floor; a restart from the same
    checkpoint re-emits nothing (scoring is stateless, files are
    exactly-once per checkpoint)."""
    docs_dir = tmp_path / "incoming"
    index_dir = tmp_path / "lm_index"
    ckpt = tmp_path / "ckpt"
    docs_dir.mkdir()

    train_rows = [(i, _SENT) for i in range(20)] + [
        (100 + i, "a stitch in time saves nine every time") for i in range(5)
    ]
    build_lm_index(_rows(spark, train_rows), str(index_dir))

    scored_rows = [
        (1000, _SENT),                                            # rung 1
        (1001, "the lazy dog jumps over the quick brown fox"),    # rung 2
        (1002, "colorless green ideas sleep furiously over nine dog"),  # OOV
    ]
    _write(spark, docs_dir, scored_rows)

    got = []
    q = start_scoring_stream(
        spark,
        str(docs_dir),
        str(index_dir),
        lambda df, bid: got.extend(df.collect()),
        str(ckpt),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {r["doc_id"]: (r["n_trigrams"], r["lp_sum_micro"]) for r in got}
    expected = {
        r["doc_id"]: (r["n_trigrams"], r["lp_sum_micro"])
        for r in trigram_doc_scores(
            _rows(spark, train_rows), _rows(spark, scored_rows)
        ).collect()
    }
    assert streamed == expected
    # the fluent doc outranks the shuffled doc outranks the soup
    avg = {k: v[1] / (v[0] * 1e6) for k, v in streamed.items()}
    assert avg[1000] > avg[1001] > avg[1002]

    # restart from the same checkpoint: nothing replays
    got2 = []
    q2 = start_scoring_stream(
        spark,
        str(docs_dir),
        str(index_dir),
        lambda df, bid: got2.extend(df.collect()),
        str(ckpt),
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert got2 == []
