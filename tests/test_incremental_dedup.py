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
    # corpus' truncated variants, fed as ONE micro-batch file so the
    # expected set is deterministic: every batch-query pair whose newer
    # side is a variant — original x variant via the index join,
    # variant x variant via the intra-batch self-join
    index_sig = build_signature_index(load(spark, sf_dir, "documents")).cache()
    index_sig.count()
    variants = (
        _near_dup_corpus(spark, sf_dir)
        .where(f"doc_id >= {_VARIANT_OFFSET}")
        .collect()
    )
    with open(docs_dir / "batch0.jsonl", "w") as f:
        for r in variants:
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
        if r["doc_b"] >= _VARIANT_OFFSET
    }
    assert streamed == expected
    assert len(streamed) > 0


def test_growing_index_catches_stream_internal_dups(spark, tmp_path):
    """With index_growth_dir, a doc arriving in batch 2 matches a
    near-copy that arrived in batch 1 (not just the original corpus)."""
    docs_dir = tmp_path / "incoming"
    growth = tmp_path / "grown_index"
    ckpt = tmp_path / "ckpt"
    docs_dir.mkdir()

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    text_c = " ".join(words)
    text_c2 = " ".join(words[:-2])  # near-copy: 2 trailing words dropped
    base = spark.createDataFrame(
        [(1, "one totally unrelated corpus document here"),
         (2, "another different corpus document entirely now")],
        "doc_id long, text string",
    )
    index_sig = build_signature_index(base).cache()
    index_sig.count()

    import json as _json

    with open(docs_dir / "b1.jsonl", "w") as f:
        f.write(_json.dumps({"doc_id": 100, "text": text_c}) + "\n")

    got = []
    q = stream_against_index(
        spark,
        str(docs_dir),
        index_sig,
        lambda df, bid: got.extend(df.collect()),
        str(ckpt),
        index_growth_dir=str(growth),
    )
    try:
        q.processAllAvailable()
        assert got == []  # batch 1: nothing matches the base index
        with open(docs_dir / "b2.jsonl", "w") as f:
            f.write(_json.dumps({"doc_id": 200, "text": text_c2}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()

    pairs = {(r["doc_id"], r["dup_of"]) for r in got}
    assert pairs == {(200, 100)}
    assert all(r["jaccard"] >= 0.5 for r in got)
