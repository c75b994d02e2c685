"""End-to-end streaming clean-corpus maintenance: quality filtering +
incremental dedup against a growing index, across micro-batches."""

import json

from composable_logs_spark.streaming.corpus_pipeline import stream_clean_corpus
from composable_logs_spark.streaming.incremental_dedup import build_signature_index

GOOD_1 = ("the quick brown fox jumps over a lazy dog while the sun sets "
          "and a river flows down to the quiet valley tonight")
GOOD_2 = ("a gentle wind moves through the tall trees and the old mill "
          "turns slowly beside a stream in the warm evening light")
BASE_A = ("the silver ship sails across a wide ocean toward the distant "
          "harbor where a beacon burns through the cold night fog")


def _near_copy(text):
    return " ".join(text.split()[:-2])


def test_stream_clean_corpus(spark, tmp_path):
    docs_dir = tmp_path / "incoming"
    out = tmp_path / "clean_corpus"
    growth = tmp_path / "index_growth"
    ckpt = tmp_path / "ckpt"
    docs_dir.mkdir()
    growth.mkdir()

    base = spark.createDataFrame(
        [(1, BASE_A), (2, "another unrelated base corpus document entirely")],
        "doc_id long, text string",
    )
    index_sig = build_signature_index(base).cache()
    index_sig.count()

    def write_batch(name, rows):
        with open(docs_dir / name, "w") as f:
            for did, text in rows:
                f.write(json.dumps(
                    {"doc_id": did, "text": text, "lang": "en", "source": "crawl"}
                ) + "\n")

    write_batch("b1.jsonl", [
        (10, GOOD_1),                              # kept
        (11, "lorem ipsum " + GOOD_1),             # boilerplate -> dropped
        (12, _near_copy(BASE_A)),                  # near-dup of index -> dropped
    ])

    q = stream_clean_corpus(
        spark, str(docs_dir), index_sig, str(out), str(growth), str(ckpt)
    )
    try:
        q.processAllAvailable()
        write_batch("b2.jsonl", [
            (20, _near_copy(GOOD_1)),              # near-dup of batch-1 arrival
            (21, GOOD_2),                          # kept
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    corpus = spark.read.parquet(str(out))
    assert {r["doc_id"] for r in corpus.collect()} == {10, 21}
    assert set(corpus.columns) == {"doc_id", "text", "lang", "source"}
    # the index grew by exactly the kept docs' signatures
    grown = spark.read.parquet(str(growth))
    assert {r["doc_id"] for r in grown.collect()} == {10, 21}


def test_corpus_line_dedup_strips_planted_boilerplate(spark, sf_dir):
    """Variant docs are original text wrapped in a subscribe header +
    copyright footer; corpus-wide line dedup must strip exactly those
    lines, reassembling the original text byte-for-byte."""
    from pyspark.sql import functions as F

    from composable_logs_spark.queries import load
    from composable_logs_spark.queries.corpus_q import (
        _VARIANT_OFFSET,
        corpus_line_dedup,
    )

    out = corpus_line_dedup(spark, sf_dir)
    originals = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    variants = {
        r["doc_id"] - _VARIANT_OFFSET: r
        for r in out.where(F.col("doc_id") >= _VARIANT_OFFSET).collect()
    }
    assert set(variants) == set(originals)
    for doc_id, row in variants.items():
        assert row["n_dropped"] >= 2  # header + footer gone
        # surviving lines == the original text, order preserved
        assert row["cleaned_text"] == originals[doc_id]
    # original docs contain no corpus-wide boilerplate -> nothing dropped
    orig_rows = out.where(F.col("doc_id") < _VARIANT_OFFSET).collect()
    assert len(orig_rows) == len(originals)
    assert all(r["n_dropped"] == 0 for r in orig_rows)
