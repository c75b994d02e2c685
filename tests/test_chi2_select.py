"""Chi-square feature selection (queries/chi2_q) against an
independent pure-Python contingency replica on a hand corpus with
known associations, plus the min-df / everywhere-term cuts and the
A = 0 negative-association path."""

from collections import defaultdict

from pyspark.sql import functions as F

from composable_logs_spark.queries.chi2_q import chi2_feature_select


def _corpus(spark):
    # two classes x 6 docs; "alpha" is a perfect 'en' marker, "beta" a
    # perfect 'de' marker, "common" appears everywhere (must be cut),
    # "rare" appears once (below min_df), "tilt" leans 'en' 3:1.
    rows = [
        (1, "en", "alpha common tilt filler1"),
        (2, "en", "alpha common tilt filler2"),
        (3, "en", "alpha common tilt rare"),
        (4, "de", "beta common filler1"),
        (5, "de", "beta common tilt filler2"),
        (6, "de", "beta common filler3"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _python_chi2(rows, min_df, top_k):
    """Independent replica: explicit A/B/C/D contingency (NOT the
    collapsed A*N - df*n_c identity the engine uses)."""
    n = len(rows)
    docs = [(lang, set(text.lower().split())) for _, lang, text in rows]
    n_c = defaultdict(int)
    for lang, _ in docs:
        n_c[lang] += 1
    df_t = defaultdict(int)
    a_tc = defaultdict(int)
    for lang, terms in docs:
        for t in terms:
            df_t[t] += 1
            a_tc[(t, lang)] += 1
    out = {}
    for cls in n_c:
        scored = []
        for t, df in df_t.items():
            if df < min_df or df >= n:
                continue
            a = a_tc.get((t, cls), 0)
            b, c = df - a, n_c[cls] - a
            d = n - n_c[cls] - b
            num = n * (a * d - b * c) ** 2
            den = df * (n - df) * n_c[cls] * (n - n_c[cls])
            scored.append((num / den, t, a, df))
        scored.sort(key=lambda s: (-s[0], s[1]))
        out[cls] = scored[:top_k]
    return out


def test_matches_independent_replica_and_cuts(spark):
    rows = [(r[0], r[1], r[2]) for r in _corpus(spark).collect()]
    expect = _python_chi2(rows, min_df=2, top_k=3)
    got = chi2_feature_select(_corpus(spark), min_df=2, top_k=3).collect()
    by_cls = defaultdict(list)
    for r in got:
        by_cls[r["cls"]].append(r)
    for cls, exp in expect.items():
        rows_c = sorted(by_cls[cls], key=lambda r: r["rank"])
        assert [r["term"] for r in rows_c] == [t for _, t, _, _ in exp]
        for r, (chi2, _, a, df) in zip(rows_c, exp):
            assert abs(r["chi2"] - chi2) < 5e-5
            assert (r["df_in_class"], r["df_total"]) == (a, df)
    terms = {r["term"] for r in got}
    assert "common" not in terms  # df_t == N is cut
    assert "rare" not in terms  # below min_df
    # the two perfect markers tie at the top of BOTH classes (the 2x2
    # statistic is symmetric for binary labels) and the tie breaks on
    # term order — alpha then beta, in each class
    for cls in ("en", "de"):
        top2 = [r["term"] for r in sorted(by_cls[cls], key=lambda r: r["rank"])][:2]
        assert top2 == ["alpha", "beta"]


def test_negative_association_scores_without_presence(spark):
    # "beta" never occurs in 'en' docs (A = 0) yet must appear in the
    # en-ranked frame: a perfect absence is a perfectly informative
    # feature, and chi2 is symmetric in the 2x2 table.
    got = chi2_feature_select(_corpus(spark), min_df=2, top_k=3).collect()
    en = {r["term"]: r for r in got if r["cls"] == "en"}
    assert "beta" in en and en["beta"]["df_in_class"] == 0
    # symmetric table: chi2(beta, en) == chi2(beta, de) for 2 classes
    de = {r["term"]: r for r in got if r["cls"] == "de"}
    assert en["beta"]["chi2"] == de["beta"]["chi2"]


def test_blank_tokens_ignored(spark):
    df = _corpus(spark).withColumn(
        "text", F.concat(F.lit("  "), "text", F.lit("   "))
    )
    base = chi2_feature_select(_corpus(spark), min_df=2, top_k=3).collect()
    padded = chi2_feature_select(df, min_df=2, top_k=3).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, padded))
