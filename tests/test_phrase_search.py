"""Positional phrase search, checked against a pure-Python scan of the
same corpus (third implementation), plus the rarest-word-seeding
candidate-minimality property."""

import re

import pandas as pd

from composable_logs_spark.queries.phrase_q import (
    _N_QUERIES,
    _PHRASE_LEN,
    _candidates,
    _postings,
    _qwords,
    _seed_table,
    text_phrase_search,
)


def _py_search(sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {
        int(r.doc_id): re.split(r"\s+", r.text.strip().lower())
        for r in pdf.itertuples()
    }
    out = {}
    for qid in range(_N_QUERIES):
        phrase = toks[qid][:_PHRASE_LEN]
        docs, occ = set(), 0
        for doc_id, arr in toks.items():
            for i in range(len(arr) - _PHRASE_LEN + 1):
                if arr[i : i + _PHRASE_LEN] == phrase:
                    docs.add(doc_id)
                    occ += 1
        out[qid] = (" ".join(phrase), len(docs), occ)
    return out


def test_phrase_search_matches_python_scan(spark, sf_dir):
    expect = _py_search(sf_dir)
    got = {r["query_id"]: r for r in text_phrase_search(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for qid, (phrase, n_docs, n_occ) in expect.items():
        r = got[qid]
        assert r["phrase"] == phrase
        assert r["n_docs"] == n_docs and r["n_occurrences"] == n_occ
        # the source document itself always matches
        assert n_docs >= 1 and n_occ >= n_docs


def test_rarest_seed_shrinks_candidates_on_stopword_phrase(spark):
    """A stopword-led phrase ("the rare gem"): first-word seeding drags
    in every posting of "the"; rarest-word seeding must produce a
    strictly smaller candidate set — and an identical final answer."""
    docs = [(0, "the rare gem sits here"), (1, "tiny"), (2, "too short")] + [
        (i, "the " * 10 + f"filler{i} words the and the") for i in range(3, 30)
    ]
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    post, qw = _postings(d), _qwords(d)
    n_rare = _candidates(post, _seed_table(post, qw, "rarest")).count()
    n_first = _candidates(post, _seed_table(post, qw, "first")).count()
    assert n_rare < n_first
    # the seed choice never changes the matches
    seeds = {
        r["query_id"]: r["seed_w"]
        for r in _seed_table(post, qw, "rarest").collect()
    }
    assert seeds == {0: "rare"} or seeds == {0: "gem"}
