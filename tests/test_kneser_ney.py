"""Kneser-Ney bigram and trigram: the continuation-probability
property (the reason KN exists) plus smoothing-path accounting at both
orders."""

from pyspark.sql import functions as F

from composable_logs_spark.queries.kn_q import kn3_doc_scores, kn_doc_scores


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_continuation_beats_raw_frequency(spark):
    """'francisco' and 'report' are equally frequent in train (6 tokens
    each), but francisco only ever follows 'san' (1 context) while
    report follows 6 distinct contexts. After the seen-but-novel
    context 'fresh', KN must prefer report — raw-frequency smoothing
    (add-1) would tie them. This is the textbook San-Francisco test."""
    train = _frame(
        spark,
        [(1, "san francisco")] * 6
        + [
            (10, "alpha report"),
            (11, "beta report"),
            (12, "gamma report"),
            (13, "delta report"),
            (14, "eps report"),
            (15, "zeta report"),
            (16, "fresh air"),
        ],
    )
    scored = _frame(spark, [(100, "fresh francisco"), (101, "fresh report")])
    rows = {r["doc_id"]: r for r in kn_doc_scores(train, scored).collect()}
    # both ride the full KN path: context 'fresh' seen, both words have
    # continuation mass
    assert rows[100]["n_kn"] == 1 and rows[101]["n_kn"] == 1
    assert rows[101]["lp_sum_micro"] > rows[100]["lp_sum_micro"]


def test_smoothing_path_accounting(spark):
    """Seen bigram -> kn path; seen word after an unseen context ->
    cont path; a word in no train bigram -> floor path."""
    train = _frame(spark, [(1, "the cat sat"), (2, "the dog sat")])
    scored = _frame(
        spark,
        [
            (100, "the cat"),  # seen bigram: kn
            (101, "zzz cat"),  # unseen context, seen word: cont
            (102, "the qqq"),  # seen context, word in no bigram: floor
        ],
    )
    rows = {r["doc_id"]: r for r in kn_doc_scores(train, scored).collect()}
    assert (rows[100]["n_kn"], rows[100]["n_cont"], rows[100]["n_floor"]) == (1, 0, 0)
    assert (rows[101]["n_kn"], rows[101]["n_cont"], rows[101]["n_floor"]) == (0, 1, 0)
    assert (rows[102]["n_kn"], rows[102]["n_cont"], rows[102]["n_floor"]) == (0, 0, 1)
    # seen bigram must outscore both smoothed paths
    assert rows[100]["lp_sum_micro"] > rows[101]["lp_sum_micro"]
    assert rows[100]["lp_sum_micro"] > rows[102]["lp_sum_micro"]


def test_continuation_beats_raw_frequency_trigram_order(spark):
    """The San-Francisco property at TRIGRAM order: 'francisco' and
    'report' are equally frequent, but francisco only ever continues
    one (v, w) pattern ('san' precedes it in every trigram) while
    report continues many distinct middles. A held-out trigram whose
    (u, v) context is novel but whose middle v is a known trigram
    middle rides the kn2 (continuation-bigram) rung — where report must
    beat francisco, because the mid-level counts are TYPE counts, not
    raw frequencies."""
    train = _frame(
        spark,
        [(i, "visit old san francisco now") for i in range(6)]
        + [
            (10, "alpha wrote the report today"),
            (11, "beta filed the report late"),  # distinct contexts for report
            (12, "gamma sent the report now"),
            (13, "delta read the report here"),
            (14, "eps saw the report there"),
            (15, "zeta kept the report safe"),
        ],
    )
    # held-out: context (qq, san)/(qq, the) — 'qq' is novel so (u, v) is
    # unseen, but v ('san'/'the') is a known trigram middle -> kn2 rung
    scored = _frame(spark, [(100, "qq san francisco"), (101, "qq the report")])
    rows = {r["doc_id"]: r for r in kn3_doc_scores(train, scored).collect()}
    assert rows[100]["n_kn2"] == 1 and rows[101]["n_kn2"] == 1
    # report follows 6 distinct middles-with-contexts; francisco one
    assert rows[101]["lp_sum_micro"] > rows[100]["lp_sum_micro"]


def test_trigram_smoothing_path_accounting(spark):
    """One held-out trigram per rung: seen trigram -> kn3; unseen (u,v)
    with known middle -> kn2; unknown middle with known continuation ->
    cont; word in no train trigram -> floor. And the ladder must be
    monotone: each rung outscores the next for this construction."""
    train = _frame(
        spark, [(1, "the cat sat down"), (2, "the dog sat down")]
    )
    scored = _frame(
        spark,
        [
            (100, "the cat sat"),  # seen trigram: kn3
            (101, "zz cat sat"),   # novel context, 'cat' a known middle: kn2
            (102, "zz qq sat"),    # unknown middle, known continuation: cont
            (103, "the cat zzz"),  # word in no train trigram: floor
        ],
    )
    rows = {r["doc_id"]: r for r in kn3_doc_scores(train, scored).collect()}

    def paths(r):
        return (r["n_kn3"], r["n_kn2"], r["n_cont"], r["n_floor"])

    assert paths(rows[100]) == (1, 0, 0, 0)
    assert paths(rows[101]) == (0, 1, 0, 0)
    assert paths(rows[102]) == (0, 0, 1, 0)
    assert paths(rows[103]) == (0, 0, 0, 1)
    assert (
        rows[100]["lp_sum_micro"]
        > rows[101]["lp_sum_micro"]
        > rows[102]["lp_sum_micro"]
        > rows[103]["lp_sum_micro"]
    )


def test_trigram_discount_conserves_probability_mass(spark):
    """For a seen trigram context (u, v), sum_w p(w|uv) over the full
    continuation vocabulary must be exactly 1 — the D mass taken from
    seen trigrams is redistributed through the kn2 rung, whose own D
    mass is redistributed through the continuation unigram. Verified in
    exact rational arithmetic with the query's integer num/den."""
    from fractions import Fraction

    corpus = [
        "the cat sat down",
        "the dog sat down",
        "a cat ran off",
        "the cat ran off",
    ]
    tric: dict = {}
    for doc in corpus:
        t = doc.split()
        for i in range(len(t) - 2):
            k = (t[i], t[i + 1], t[i + 2])
            tric[k] = tric.get(k, 0) + 1
    cuv, n1uv, ncvw, ncv, ntv, n1w = {}, {}, {}, {}, {}, {}
    for (u, v, w), c in tric.items():
        cuv[(u, v)] = cuv.get((u, v), 0) + c
        n1uv[(u, v)] = n1uv.get((u, v), 0) + 1
        ncvw[(v, w)] = ncvw.get((v, w), 0) + 1
    for (v, w), nc in ncvw.items():
        ncv[v] = ncv.get(v, 0) + nc
        ntv[v] = ntv.get(v, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    big_b = len(ncvw)
    u, v = "the", "cat"
    total = Fraction(0)
    for w in n1w:
        c3 = tric.get((u, v, w), 0)
        nvw = ncvw.get((v, w), 0)
        num = (
            max(4 * c3 - 3, 0) * 4 * ncv[v] * big_b
            + 3 * n1uv[(u, v)] * (max(4 * nvw - 3, 0) * big_b + 3 * ntv[v] * n1w[w])
        )
        den = 16 * cuv[(u, v)] * ncv[v] * big_b
        total += Fraction(num, den)
    assert total == 1


def test_discount_conserves_probability_mass(spark):
    """For a seen context u, the KN conditional must sum to ~1 over the
    full vocabulary-of-continuations: sum_w p(w|u) = 1 exactly when
    every w with continuation mass is enumerated (the discount D taken
    from seen pairs is exactly redistributed via N1+(u.)). Checked in
    exact rational arithmetic on a small corpus via the same integer
    numerator/denominator the query uses."""
    from fractions import Fraction

    corpus = ["the cat sat", "the dog sat", "a cat ran", "the cat ran"]
    bic: dict = {}
    for doc in corpus:
        t = doc.split()
        for i in range(len(t) - 1):
            bic[(t[i], t[i + 1])] = bic.get((t[i], t[i + 1]), 0) + 1
    big_b = len(bic)
    cu = {}
    n1u = {}
    n1w = {}
    for (u, w), c in bic.items():
        cu[u] = cu.get(u, 0) + c
        n1u[u] = n1u.get(u, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    u = "the"
    total = Fraction(0)
    for w in n1w:  # every word with continuation mass
        c = bic.get((u, w), 0)
        num = max(4 * c - 3, 0) * big_b + 3 * n1u[u] * n1w[w]
        den = 4 * cu[u] * big_b
        total += Fraction(num, den)
    # sum over all continuation-bearing words of N1+(.w) is big_b, so
    # the interpolation weight integrates to exactly D*N1+(u.)/c(u)
    assert total == 1
