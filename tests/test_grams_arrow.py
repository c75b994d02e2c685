"""Bit-identity lock for the r13 Arrow rewrite of substr_q._grams.

The mapInArrow gram pass (memoized md5 per token + vectorized Horner
fold over a sliding window view) must produce EXACTLY the rows of the
original expression form (kept as _grams_expr): same doc_id/n_tokens/
pos/h multiset, for both the raw-text input shape and the pre-tokenized
`tok` shape, at both gram widths used in the module (L=20 spans, K=8
winnowing anchors).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from composable_logs_spark.queries.substr_q import _WK, _grams, _grams_expr
from composable_logs_spark.queries import load

DOCS = [
    (1, " ".join(f"w{i % 7}" for i in range(30))),  # heavy repetition
    (2, " ".join(f"u{i}" for i in range(25))),      # all-distinct tokens
    (3, "short doc under the gram width"),           # < L tokens
    (4, ""),                                          # empty text
    (5, "a  b " + " ".join(f"x{i}" for i in range(22))),  # empty tokens kept
]


def _rows(df):
    return sorted(
        (r["doc_id"], r["n_tokens"], r["pos"], r["h"]) for r in df.collect()
    )


@pytest.mark.parametrize("width", [_WK, 20])
def test_arrow_grams_bit_identical(spark, width):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert _rows(_grams(d, width)) == _rows(_grams_expr(d, width))


def test_arrow_grams_pretokenized_shape(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string").select(
        "doc_id", F.split("text", " ").alias("tok")
    )
    assert _rows(_grams(d, _WK)) == _rows(_grams_expr(d, _WK))


def test_arrow_grams_on_corpus(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    assert _rows(_grams(d)) == _rows(_grams_expr(d))
