"""Bit-identity lock for the r13 Arrow rewrite of the simhash signature.

_simhash_sig (mapInArrow: shingle/md5/nibble-bit ±1 sums/sign packing in
numpy) must produce EXACTLY the (doc_id, sim_lo, sim_hi) rows of the
original expression form (_simhash_sig_expr), on edge-case docs and on a
real corpus slice. Null-text docs drop from the frame in both forms.
"""

from __future__ import annotations

from composable_logs_spark.queries.dedup_q import (
    _near_dup_corpus,
    _simhash_sig,
    _simhash_sig_expr,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "one two"),
    (4, ""),
    (5, "rep rep rep rep rep rep"),
    (6, "tab\tsep and\nnewline tokens here padding words count"),
]


def _rows(df):
    return sorted((r["doc_id"], r["sim_lo"], r["sim_hi"]) for r in df.collect())


def test_arrow_simhash_bit_identical(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert _rows(_simhash_sig(d)) == _rows(_simhash_sig_expr(d))


def test_arrow_simhash_on_corpus(spark, sf_dir):
    corpus = _near_dup_corpus(spark, sf_dir)
    assert _rows(_simhash_sig(corpus)) == _rows(_simhash_sig_expr(corpus))
