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
