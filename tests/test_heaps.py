"""Heaps'-law vocabulary growth (queries/heaps_q), checked against an
independent pure-Python accumulation on a synthetic corpus with a known
vocabulary schedule."""

import math

from composable_logs_spark.queries.heaps_q import _N_DECILES, text_heaps_law


def _sf(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _py_curve(texts):
    n = len(texts)
    per_tokens = [0] * (_N_DECILES + 1)
    first = {}
    for i, t in enumerate(texts):
        d = (_N_DECILES * i) // n + 1  # ids 0..n-1, lo=0, hi=n-1
        toks = t.lower().split()
        per_tokens[d] += len(toks)
        for tok in toks:
            first.setdefault(tok, d)
    pts = []
    cum_t = cum_v = 0
    for d in range(1, _N_DECILES + 1):
        if per_tokens[d] == 0:
            continue
        cum_t += per_tokens[d]
        cum_v += sum(1 for md in first.values() if md == d)
        pts.append((d, cum_t, cum_v))
    xs = [math.log(t) for _, t, _ in pts]
    ys = [math.log(v) for _, _, v in pts]
    k = len(pts)
    beta = (k * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)) / (
        k * sum(x * x for x in xs) - sum(xs) ** 2
    )
    return pts, round(beta, 4)


def test_matches_python_reference(spark, tmp_path):
    # 40 docs; vocabulary grows sub-linearly: doc i reuses words 0..9
    # and mints ceil(sqrt(i)) fresh ones
    texts = []
    for i in range(40):
        common = " ".join(f"c{j}" for j in range(10))
        fresh = " ".join(f"n{i}_{j}" for j in range(math.isqrt(i) + 1))
        texts.append(common + " " + fresh)
    rows = text_heaps_law(spark, _sf(spark, tmp_path, texts)).collect()
    got = sorted((r["decile"], r["cum_tokens"], r["cum_vocab"]) for r in rows)
    want, beta = _py_curve(texts)
    assert got == sorted(want)
    assert all(abs(r["heaps_beta_r"] - beta) < 1e-9 for r in rows)
    # Heaps exponent of a saturating vocabulary sits strictly in (0, 1)
    assert 0.0 < beta < 1.0
    # cumulative curves are monotone non-decreasing
    ts = [t for _, t, _ in got]
    vs = [v for _, _, v in got]
    assert ts == sorted(ts) and vs == sorted(vs)
