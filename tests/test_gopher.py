"""Gopher quality rules (text_ops.gopher_stats): planted docs that
each violate exactly one rule, measurements vs a Python replica."""

from unittest import mock

import composable_logs_spark.queries.text_ops as T


def _good_text(n=60):
    # 60 words, >= 2 gopher stops, mean length in [3,10], all alphabetic
    words = ["the", "have", "with"] + [f"word{i}" for i in range(n - 3)]
    return " ".join(words)


def _planted(spark):
    docs = [
        (0, _good_text()),                                   # passes all
        (1, "the have " + " ".join(f"w{i}" for i in range(10))),  # too short
        (2, " ".join(["####"] * 20) + " " + _good_text(40)),      # symbols
        (3, "\n".join(["- bullet line here now"] * 19 + [_good_text()])),  # bullets
        (4, "\n".join(["trailing words here..."] * 2 + [_good_text()])),   # ellipses
        (5, "the have " + " ".join(["12345"] * 58)),              # non-alpha
        (6, "the have " + " ".join(["supercalifragilistic"] * 58)),  # long words
        (7, " ".join(f"word{i}" for i in range(60))),             # no stops
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_each_rule_fires_exactly(spark):
    with mock.patch.object(T, "load", lambda s, sf, t: _planted(spark)):
        rows = {
            r["doc_id"]: r
            for r in T.text_gopher_filters(spark, "ignored").collect()
        }
    assert rows[0]["keep_doc"] and rows[0]["n_rules_failed"] == 0
    for d in range(1, 8):
        assert not rows[d]["keep_doc"], d
    assert rows[1]["n_words"] < 50
    assert rows[2]["symbol_word_ratio"] > 0.1
    assert rows[3]["bullet_line_frac"] > 0.9
    assert rows[4]["ellipsis_line_frac"] > 0.3
    assert rows[5]["alpha_word_frac"] < 0.8
    assert rows[6]["mean_word_len"] > 10
    assert rows[7]["n_gopher_stops"] < 2
    # single-rule plants: docs 4/6/7 violate exactly one rule
    for d in (4, 6, 7):
        assert rows[d]["n_rules_failed"] == 1, (d, dict(rows[d].asDict()))


def test_measurements_match_python_replica(spark, sf_dir):
    import re

    rows = {
        r["doc_id"]: r
        for r in T.text_gopher_filters(spark, sf_dir).collect()
    }
    import pandas as pd

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    for r in pdf.itertuples():
        toks = r.text.strip().split()
        lines = r.text.split("\n")
        got = rows[r.doc_id]
        assert got["n_words"] == len(toks)
        assert abs(
            got["mean_word_len"]
            - round(sum(len(t) for t in toks) / len(toks), 4)
        ) <= 1e-4
        n_alpha = sum(1 for t in toks if re.search("[a-zA-Z]", t))
        assert abs(got["alpha_word_frac"] - round(n_alpha / len(toks), 4)) <= 1e-4
        assert got["n_gopher_stops"] == len(
            {t.lower() for t in toks} & stops
        )
