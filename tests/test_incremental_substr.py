"""Incremental exact-substring dedup (streaming/incremental_substr):
new docs matched against a persisted gram index, batch==stream span
agreement, growing-index semantics."""

from pyspark.sql import functions as F

from composable_logs_spark.queries.substr_q import _L, dup_spans
from composable_logs_spark.streaming.incremental_substr import (
    batch_dup_spans_against_index,
    build_gram_index,
    stream_substr_against_index,
)


def _span_set(rows):
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add(
            (r["span_start"], r["span_end"])
        )
    return out


def _corpus(spark):
    shared = " ".join(f"sa{i}" for i in range(30))
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    return spark.createDataFrame(
        [
            (0, uniq("c0_", 8) + " " + shared),
            (1, uniq("c1_", 40)),
        ],
        "doc_id long, text string",
    ), shared


def test_new_doc_matches_corpus_spans(spark):
    corpus, shared = _corpus(spark)
    index = build_gram_index(corpus).cache()
    new = spark.createDataFrame(
        [
            (10, " ".join(["n0"] * 0) + shared + " " + "nx ny nz"),  # dup vs corpus
            (11, "totally unique words only here " + " ".join(f"u{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    got = _span_set(batch_dup_spans_against_index(new, index).collect())
    assert 10 in got and 11 not in got
    ((s, e),) = got[10]
    assert s == 1 and e == 30  # the whole shared run, exactly

    # agreement with the batch operator on the cumulative corpus,
    # restricted to the new doc (directionality: only new docs flagged)
    full = _span_set(dup_spans(corpus.unionByName(new)).collect())
    assert got[10] == full[10]


def test_within_batch_duplicates_caught(spark):
    """Two docs arriving in the SAME batch sharing a span: flagged even
    though the index has never seen either."""
    empty_index = build_gram_index(
        spark.createDataFrame([], "doc_id long, text string")
    )
    shared = " ".join(f"wb{i}" for i in range(25))
    batch = spark.createDataFrame(
        [(20, shared + " tail0 tail1"), (21, "head0 head1 " + shared)],
        "doc_id long, text string",
    )
    got = _span_set(batch_dup_spans_against_index(batch, empty_index).collect())
    assert set(got) == {20, 21}
    assert got[20] == {(1, 25)} and got[21] == {(3, 27)}


def test_streaming_growing_index(spark, tmp_path):
    """Batch 2's doc must match batch 1's doc through the GROWN index
    (stream-internal duplication across micro-batches)."""
    corpus, shared = _corpus(spark)
    index_dir = str(tmp_path / "gidx")
    build_gram_index(corpus).write.parquet(index_dir)

    docs_dir = str(tmp_path / "docs")
    b1 = " ".join(f"s1_{i}" for i in range(28))  # unique vs corpus
    spark.createDataFrame(
        [(30, b1 + " x0 x1")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(docs_dir)

    out_dir = str(tmp_path / "spans_out")
    q = stream_substr_against_index(
        spark, docs_dir, index_dir, out_dir, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        # batch 2: repeats batch 1's run AND the original corpus run
        spark.createDataFrame(
            [(31, b1 + " " + shared)], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(docs_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    got = _span_set(spark.read.parquet(out_dir).collect())
    # doc 30 matched nothing at arrival time (directional)
    assert 30 not in got
    # doc 31: one span covering b1 (via grown index) and one covering
    # shared (via corpus index) — b1 is 28 tokens at pos 1..28, shared
    # 30 tokens at pos 29..58; they touch, so the merge may produce one
    # span 1..58 — both token runs must be covered either way
    covered = set()
    for s, e in got[31]:
        covered.update(range(s, e + 1))
    assert set(range(1, 29)) <= covered      # b1 via grown index
    assert set(range(29, 59)) <= covered     # shared via corpus index


def test_empty_index_batch_unique_docs_flag_nothing(spark):
    empty_index = build_gram_index(
        spark.createDataFrame([], "doc_id long, text string")
    )
    batch = spark.createDataFrame(
        [(40, " ".join(f"q{i}" for i in range(_L + 10)))],
        "doc_id long, text string",
    )
    assert batch_dup_spans_against_index(batch, empty_index).count() == 0
