"""Stream-vs-batch equivalence for incremental minhash dedup: streaming
the near-dup variants against an index of the originals must produce
exactly the batch query's original-x-variant pairs."""

import json

from composable_logs_spark.queries import load
from composable_logs_spark.queries.dedup_q import (
    _VARIANT_OFFSET,
    _near_dup_corpus,
    dedup_minhash_lsh,
)
from composable_logs_spark.streaming.incremental_dedup import (
    build_signature_index,
    stream_against_index,
)


def test_stream_matches_batch_pairs(spark, sf_dir, tmp_path):
    docs_dir = tmp_path / "incoming"
    ckpt = tmp_path / "ckpt"
    docs_dir.mkdir()

    # "existing corpus" = the original documents; "arriving docs" = the
    # corpus' truncated variants, fed across two micro-batch files
    index_sig = build_signature_index(load(spark, sf_dir, "documents")).cache()
    index_sig.count()
    variants = (
        _near_dup_corpus(spark, sf_dir)
        .where(f"doc_id >= {_VARIANT_OFFSET}")
        .collect()
    )
    half = len(variants) // 2
    for i, chunk in enumerate((variants[:half], variants[half:])):
        with open(docs_dir / f"batch{i}.jsonl", "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    got = []
    q = stream_against_index(
        spark,
        str(docs_dir),
        index_sig,
        lambda df, bid: got.extend(df.collect()),
        str(ckpt),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {(r["doc_id"], r["dup_of"], r["jaccard"]) for r in got}
    batch = dedup_minhash_lsh(spark, sf_dir)
    expected = {
        (r["doc_b"], r["doc_a"], r["jaccard"])
        for r in batch.collect()
        if r["doc_a"] < _VARIANT_OFFSET <= r["doc_b"]
    }
    assert streamed == expected
    assert len(streamed) > 0
