"""Trigram stupid-backoff LM: backoff-rung behaviour on planted prose,
and the property that motivates the extra rung — on held-out fluent
text the backoff model beats the add-1 bigram (which pays the full
vocabulary discount on every bigram, seen or not)."""

import math

from pyspark.sql import functions as F

from composable_logs_spark.queries.text_ops import bigram_doc_scores
from composable_logs_spark.queries.trigram_q import trigram_doc_scores

_SENT = "the quick brown fox jumps over the lazy dog"


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _avg(rows, doc_id):
    (r,) = [x for x in rows if x["doc_id"] == doc_id]
    return r["lp_sum_micro"] / (r["n_trigrams"] * 1e6)


def test_backoff_rungs_and_fluency_ranking(spark):
    # train: the same fluent sentence many times + a little variety
    train = _df(
        spark,
        [(i, _SENT) for i in range(20)]
        + [(100 + i, "a stitch in time saves nine every time") for i in range(5)],
    )
    scored = _df(
        spark,
        [
            # fully-seen trigrams: every rung-1 ratio is c3/cb12 = 1 -> lp ~ 0
            (0, _SENT),
            # unseen trigram, seen bigrams ("dog jumps" never trained but
            # "the lazy dog" / "fox jumps" are): middle rung engages
            (1, "the lazy dog jumps over the quick brown fox"),
            # token soup incl. OOV: unigram floor
            (2, "colorless green ideas sleep furiously over nine dog"),
        ],
    )
    rows = trigram_doc_scores(train, scored).collect()
    fluent, shuffled, soup = (_avg(rows, i) for i in range(3))
    assert fluent > shuffled > soup
    # fully-seen deterministic prose scores near ln(1) = 0
    assert fluent > -0.1
    # the soup fell to the discounted unigram floor: well below ln(0.16)
    assert soup < math.log(0.16)


def _py_trigram_scores(train_texts, scored_texts):
    """Pure-Python stupid backoff — full third implementation of the
    spec (counts, rungs, micro-nat rounding) for exact comparison."""
    from collections import Counter

    def toks(t):
        import re

        return re.split(r"\s+", t.strip().lower())

    tri, bi, uni = Counter(), Counter(), Counter()
    for _, t in train_texts:
        a = toks(t)
        # mirror the engines: zero-length tokens (split of an empty doc
        # yields ['']) never enter the unigram table
        uni.update(w for w in a if w)
        if len(a) >= 2:
            bi.update(zip(a, a[1:]))
        if len(a) >= 3:
            tri.update(zip(a, a[1:], a[2:]))
    n_toks, v = sum(uni.values()), len(uni)
    out = {}
    for doc_id, t in scored_texts:
        a = toks(t)
        if len(a) < 3:
            continue
        s, n = 0, 0
        for g in zip(a, a[1:], a[2:]):
            if g in tri:
                x = tri[g] / bi[(g[0], g[1])]
            elif (g[1], g[2]) in bi:
                x = 0.4 * bi[(g[1], g[2])] / uni[g[1]]
            else:
                x = 0.16 * (uni.get(g[2], 0) + 1) / (n_toks + v)
            # mirror the engines exactly: one ln per rung, then
            # HALF_UP = round-half-AWAY-FROM-ZERO (Spark round /
            # DuckDB round both do this; floor(x+0.5) would differ on
            # an exact negative .5 tie)
            y = math.log(x) * 1e6
            s += int(math.floor(abs(y) + 0.5) * (1 if y >= 0 else -1))
            n += 1
        out[doc_id] = (n, s)
    return out


def test_exact_micro_nats_match_python_model(spark):
    """Exact lp_sum_micro equality on a corpus that exercises ALL three
    rungs plus OOV, against the pure-Python model."""
    train = [
        (i, "the cat sat on the mat and the dog ran off") for i in range(7)
    ] + [(50 + i, "a river runs through the green valley today") for i in range(3)]
    scored = [
        (0, "the cat sat on the mat"),              # rung 1 everywhere
        (1, "the dog sat on the green mat"),        # mixes rungs 1-2
        (2, "zz qq the cat hopped valley xx"),      # rung 3 + OOV
        (3, "mat the off dog and cat the on sat"),  # shuffled: backoff soup
    ]
    expect = _py_trigram_scores(train, scored)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["lp_sum_micro"])
        for r in trigram_doc_scores(
            _df(spark, train), _df(spark, scored)
        ).collect()
    }
    assert got == expect


def test_empty_train_docs_do_not_inflate_vocab(spark):
    """Empty / whitespace-only training docs must be invisible to the
    model: split('') yields [''] and the phantom '' token previously
    entered the unigram table, inflating N and V in the add-1 floor
    (round-10 ADVICE). Scores with and without such docs must be
    micro-nat identical, in Spark and in the Python model."""
    clean = [(i, _SENT) for i in range(5)]
    dirty = clean + [(90, ""), (91, "   \t  ")]
    scored = [(0, "zz qq colorless dog ideas")]  # OOV: hits the floor
    got_clean = {
        r["doc_id"]: (r["n_trigrams"], r["lp_sum_micro"])
        for r in trigram_doc_scores(_df(spark, clean), _df(spark, scored)).collect()
    }
    got_dirty = {
        r["doc_id"]: (r["n_trigrams"], r["lp_sum_micro"])
        for r in trigram_doc_scores(_df(spark, dirty), _df(spark, scored)).collect()
    }
    assert got_clean == got_dirty == _py_trigram_scores(dirty, scored)


def test_backoff_beats_add1_bigram_on_heldout_prose(spark):
    """The add-1 bigram smears c(w1)+V into every denominator, so even a
    bigram seen 20 times scores ~ln(20/V); stupid backoff keeps the ML
    ratio on seen n-grams. On held-out planted prose (trained-on
    sentence, unseen doc) the backoff per-gram average must be higher."""
    train_rows = [(i, _SENT) for i in range(20)] + [
        (100 + i, f"filler{i} words about topic{i} number{i} nine") for i in range(30)
    ]
    heldout = [(1000, _SENT)]
    train = _df(spark, train_rows)
    tri = trigram_doc_scores(train, _df(spark, heldout)).collect()
    tri_avg = _avg(tri, 1000)
    # the bigram LM trains on its own input frame: give it train+heldout
    bi = (
        bigram_doc_scores(_df(spark, train_rows + heldout))
        .where(F.col("doc_id") == 1000)
        .collect()
    )
    bi_avg = bi[0]["lp_sum_micro"] / (bi[0]["n_bigrams"] * 1e6)
    assert tri_avg > bi_avg


def test_self_trained_scorer_equals_general_scorer(spark, sf_dir):
    """r14 parity lock: self_trained_doc_scores(arr) must be
    bit-identical to trigram_doc_scores(arr, arr) — the specialization
    rests on every scored trigram hitting the seen-trigram rung, which
    this proves on a real corpus (plus the planted-prose frame)."""
    from composable_logs_spark.queries import load
    from composable_logs_spark.queries.trigram_q import (
        self_trained_doc_scores,
        trigram_doc_scores,
    )

    def rows(df):
        return sorted(
            (r["doc_id"], r["n_trigrams"], r["lp_sum_micro"]) for r in df.collect()
        )

    corpus = load(spark, sf_dir, "documents").select("doc_id", "text")
    assert rows(self_trained_doc_scores(corpus)) == rows(
        trigram_doc_scores(corpus, corpus)
    )
    planted = _df(
        spark,
        [(i, _SENT) for i in range(5)]
        + [(100 + i, f"filler{i} words about topic{i} number{i} nine") for i in range(5)]
        + [(200, "a b"), (201, "")],  # <3 tokens: excluded by both
    )
    assert rows(self_trained_doc_scores(planted)) == rows(
        trigram_doc_scores(planted, planted)
    )
