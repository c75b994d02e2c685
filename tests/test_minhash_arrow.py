"""Bit-identity lock for the r13 Arrow rewrite of minhash_mh.

The mapInArrow pass (tokenize/shingle/md5/universal-hash minima in
numpy) must produce EXACTLY the rows of the original all-expression
formulation (kept as _minhash_mh_expr) — same hashes arrays (order
included: both distincts are first-occurrence), same mh0..mh11.
Exercises the edge shapes: <3-token docs (empty-string padding),
whitespace-only and empty docs, tab/newline separators (Java \\s),
repeated shingles (distinct), and unicode text (md5 over UTF-8 bytes).
"""

from __future__ import annotations

import pytest

from composable_logs_spark.queries.dedup_q import _K, _minhash_mh_expr, minhash_mh

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "one two"),
    (4, "single"),
    (5, ""),
    (6, "   "),
    (7, "tab\tsep\ttokens and\nnewlines\rcarriage\x0bvt\x0cff end"),
    (8, "rep rep rep rep rep rep rep rep"),
    (9, "naïve café über straße 東京 data"),
    (10, "a  b   c    d"),  # runs of spaces collapse to one separator
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _rows(df):
    cols = ["doc_id", "hashes", *[f"mh{s}" for s in range(_K)]]
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: t[0],
    )


def test_arrow_minhash_bit_identical_to_expression_form(spark, docs_df):
    got = _rows(minhash_mh(docs_df))
    want = _rows(_minhash_mh_expr(docs_df))
    assert got == want


def test_arrow_minhash_on_corpus_slice(spark, sf_dir):
    # real corpus shapes (sf0.001 documents + the truncated variant)
    from composable_logs_spark.queries.dedup_q import _near_dup_corpus

    corpus = _near_dup_corpus(spark, sf_dir)
    got = _rows(minhash_mh(corpus))
    want = _rows(_minhash_mh_expr(corpus))
    assert got == want
