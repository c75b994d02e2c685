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
