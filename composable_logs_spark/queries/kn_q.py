"""Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
Goodman 1999) — the classic SMOOTHING rung the n-gram ladder
(``text_bigram_logprob``: add-1; ``trigram_logprob``: stupid backoff)
is missing. KN's two ideas, both visible in this query's output:

- absolute discounting: every seen bigram donates a fixed D of its
  count to unseen events, instead of add-1's flat prior;
- CONTINUATION probability: the backoff weight of a word is how many
  distinct contexts it follows (N1+(.w)), not how often it occurs —
  the canonical example being "francisco": frequent, but glued to
  "san", so it should get almost no mass after novel contexts
  (property-tested on exactly that construction).

Same corpus split as the trigram LM (train = doc_id % 10 != 0,
score the rest). Per held-out bigram (u, w), D = 3/4:

  seen-anything path (c(u.) > 0 and N1+(.w) > 0):
      p = max(c(uw) - D, 0)/c(u.) + D * N1+(u.)/c(u.) * N1+(.w)/B
  unseen context, seen continuation:  p = N1+(.w) / B
  OOV floor (word in no train bigram): p = (c(w) + 1) / (N + V)

where c(u.) is u's bigram-token count, N1+(u.) / N1+(.w) the distinct
right/left-neighbour type counts, B the total bigram type count.
Cross-engine exactness: with D = 3/4 the interpolated sum clears to
one EXACT integer ratio —

      (max(4*c(uw) - 3, 0) * B + 3 * N1+(u.) * N1+(.w))
      -----------------------------------------------
                       4 * c(u.) * B

so both engines divide the same two bigints once, take ln of the same
double, and round to integer micro-nats (the trigram discipline; only
the final per-doc average divides floats). Overflow guard before the
multiply, bm25-style: 4*c*B must fit int64 — at a corpus where it
doesn't, re-scale B's unit down (raise, never wrap).

Scale shape: identical to the trigram plan one rung down — three
map-side-combinable hash aggs build the count tables (bigram types,
per-u totals, per-w continuation counts); the scored stream (10%)
takes equi-joins against them on the n-gram key (vocab-scale tables,
never broadcast — the bm25 postings boundary); only the 3-scalar
(B, N, V) row is broadcast. No window, no sort.

Reference anchor: none (north-star scope, SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load
from .trigram_q import _ngrams, _with_arr

_HOLDOUT_MOD = 10


def kn_model(train: DataFrame) -> dict[str, DataFrame]:
    """The KN count tables from a (doc_id, text) or (doc_id, arr)
    frame: bic (u, w, cuw), ctx (u, cu, n1u), cont (w, n1w), uni
    (w, c1), and the 1-row bnv (big_b, n_toks, v)."""
    bi = _ngrams(train, 2, "u", "w")
    bic = bi.groupBy("u", "w").agg(F.count("*").alias("cuw"))
    # per-context totals OVER BIGRAM TOKENS (the KN denominator) and
    # distinct-continuation type counts, from one pass over the types
    ctx = bic.groupBy("u").agg(
        F.sum("cuw").alias("cu"), F.count("*").alias("n1u")
    )
    cont = bic.groupBy("w").agg(F.count("*").alias("n1w"))
    uni = (
        _with_arr(train)
        .select(F.explode("arr").alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    bnv = bic.agg(F.count("*").alias("big_b")).crossJoin(
        F.broadcast(uni.agg(F.sum("c1").alias("n_toks"), F.count("*").alias("v")))
    )
    return {"bic": bic, "ctx": ctx, "cont": cont, "uni": uni, "bnv": bnv}


def kn_doc_scores(train: DataFrame, scored: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, n_kn, n_cont, n_floor, lp_sum_micro) for
    every ``scored`` doc with >= 2 tokens under the KN model trained on
    ``train`` — the rung counts expose which smoothing path each
    document's mass rode (and give the oracle three extra columns to
    catch a path-selection bug the sum alone could mask)."""
    m = kn_model(train)
    h = _ngrams(scored, 2, "u", "w")
    joined = (
        h.join(m["bic"], ["u", "w"], "left")
        .join(m["ctx"], "u", "left")
        .join(m["cont"], "w", "left")
        .join(
            m["uni"].select(F.col("tok").alias("w"), "c1"), "w", "left"
        )
        .crossJoin(F.broadcast(m["bnv"]))
    )
    # numerator bound: max(4c-3,0)*B + 3*n1u*n1w <= 4*cu*B + 3*cu*B
    # (c(uw) <= cu, n1u <= cu, n1w <= B), so guarding 8*cu*B covers both
    # numerator and denominator
    guard = (
        "CASE WHEN CAST(8 * cu AS DOUBLE) * big_b >= 9.0e18"
        " THEN raise_error('kn: 8*c(u)*B exceeds int64 — re-scale the"
        " type-count unit down') ELSE 1 END"
    )
    kn_num = (
        "greatest(4 * coalesce(cuw, 0) - 3, cast(0 as bigint)) * big_b"
        " + 3 * n1u * n1w"
    )
    lp = (
        F.when(
            F.col("cu").isNotNull() & F.col("n1w").isNotNull(),
            F.log(
                F.expr(f"cast(({kn_num}) * {guard} as double)")
                / F.expr("cast(4 * cu * big_b as double)")
            ),
        )
        .when(
            F.col("n1w").isNotNull(),
            F.log(F.col("n1w").cast("double") / F.col("big_b").cast("double")),
        )
        .otherwise(
            F.log(
                (F.coalesce(F.col("c1"), F.lit(0)) + 1).cast("double")
                / (F.col("n_toks") + F.col("v")).cast("double")
            )
        )
    )
    path = (
        F.when(F.col("cu").isNotNull() & F.col("n1w").isNotNull(), F.lit("kn"))
        .when(F.col("n1w").isNotNull(), F.lit("cont"))
        .otherwise(F.lit("floor"))
    )
    return (
        joined.select(
            "doc_id",
            F.round(lp * 1e6).cast("long").alias("lp_micro"),
            path.alias("path"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("path") == "kn", 1).otherwise(0))
            .cast("long")
            .alias("n_kn"),
            F.sum(F.when(F.col("path") == "cont", 1).otherwise(0))
            .cast("long")
            .alias("n_cont"),
            F.sum(F.when(F.col("path") == "floor", 1).otherwise(0))
            .cast("long")
            .alias("n_floor"),
            F.sum("lp_micro").alias("lp_sum_micro"),
        )
    )


def kn3_model(train: DataFrame) -> dict[str, DataFrame]:
    """Interpolated-KN TRIGRAM count tables, every lower order derived
    from the trigram TYPE table (the textbook continuation counts, Chen
    & Goodman 1999 §3): tric (u,v,w, c3), ctx3 (u,v, cuv, n1uv), mid
    (v,w, ncvw — distinct left-neighbour count of bigram vw), midctx
    (v, ncv, ntv), cont (w, n1w — distinct v preceding w), uni (floor
    counts), and the 1-row bnv (big_b = trigram-derived bigram type
    count, n_toks, v)."""
    tric = _ngrams(train, 3, "u", "v", "w").groupBy("u", "v", "w").agg(
        F.count("*").alias("c3")
    )
    ctx3 = tric.groupBy("u", "v").agg(
        F.sum("c3").alias("cuv"), F.count("*").alias("n1uv")
    )
    mid = tric.groupBy("v", "w").agg(F.count("*").alias("ncvw"))
    midctx = mid.groupBy("v").agg(
        F.sum("ncvw").alias("ncv"), F.count("*").alias("ntv")
    )
    cont = mid.groupBy("w").agg(F.count("*").alias("n1w"))
    uni = (
        _with_arr(train)
        .select(F.explode("arr").alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    # vocab size is "vsz", NOT "v": the trigram token columns are
    # (u, v, w) and a bnv "v" would be ambiguous after the cross join
    bnv = mid.agg(F.count("*").alias("big_b")).crossJoin(
        F.broadcast(
            uni.agg(F.sum("c1").alias("n_toks"), F.count("*").alias("vsz"))
        )
    )
    return {
        "tric": tric, "ctx3": ctx3, "mid": mid, "midctx": midctx,
        "cont": cont, "uni": uni, "bnv": bnv,
    }


def kn3_doc_scores(train: DataFrame, scored: DataFrame) -> DataFrame:
    """(doc_id, n_trigrams, n_kn3, n_kn2, n_cont, n_floor,
    lp_sum_micro) for every ``scored`` doc with >= 3 tokens under the
    interpolated-KN trigram model trained on ``train``.

    Per held-out trigram (u, v, w), D = 3/4 at both orders:

      kn3 (context uv seen, w a known continuation):
          p = max(c3-D,0)/cuv + D*n1uv/cuv * p2(w|v)
      kn2 (uv unseen, v seen as a trigram middle):
          p = p2(w|v) = max(ncvw-D,0)/ncv + D*ntv/ncv * n1w/B
      cont (v unseen as middle, w a known continuation): p = n1w/B
      floor (w in no train trigram): p = (c(w)+1)/(N+V)

    Exact-integer clearing (the bigram query's discipline, one order
    up): with D = 3/4 the kn3 sum is the single bigint ratio

        max(4*c3-3,0)*4*ncv*B + 3*n1uv*(max(4*ncvw-3,0)*B + 3*ntv*n1w)
        ---------------------------------------------------------------
                              16*cuv*ncv*B

    so both engines divide the same two bigints once. Overflow guard
    before the multiply (37*cuv*ncv*B bounds every term; raise, never
    wrap — Spark's non-ANSI mode wraps silently where DuckDB raises)."""
    m = kn3_model(train)
    h = _ngrams(scored, 3, "u", "v", "w")
    joined = (
        h.join(m["tric"], ["u", "v", "w"], "left")
        .join(m["ctx3"], ["u", "v"], "left")
        .join(m["mid"], ["v", "w"], "left")
        .join(m["midctx"], "v", "left")
        .join(m["cont"], "w", "left")
        .join(m["uni"].select(F.col("tok").alias("w"), "c1"), "w", "left")
        .crossJoin(F.broadcast(m["bnv"]))
    )
    guard = (
        "CASE WHEN CAST(37 * cuv AS DOUBLE) * ncv * big_b >= 9.0e18"
        " THEN raise_error('kn3: 37*c(uv)*nc(v)*B exceeds int64 —"
        " re-scale the type-count unit down') ELSE 1 END"
    )
    kn3_num = (
        "(greatest(4 * coalesce(c3, 0) - 3, cast(0 as bigint)) * 4 * ncv * big_b"
        " + 3 * n1uv * (greatest(4 * coalesce(ncvw, 0) - 3, cast(0 as bigint))"
        "               * big_b + 3 * ntv * n1w))"
    )
    kn2_num = (
        "(greatest(4 * coalesce(ncvw, 0) - 3, cast(0 as bigint)) * big_b"
        " + 3 * ntv * n1w)"
    )
    lp = (
        F.when(
            F.col("cuv").isNotNull() & F.col("n1w").isNotNull(),
            F.log(
                F.expr(f"cast({kn3_num} * {guard} as double)")
                / F.expr("cast(16 * cuv * ncv * big_b as double)")
            ),
        )
        .when(
            F.col("ncv").isNotNull() & F.col("n1w").isNotNull(),
            F.log(
                F.expr(f"cast({kn2_num} as double)")
                / F.expr("cast(4 * ncv * big_b as double)")
            ),
        )
        .when(
            F.col("n1w").isNotNull(),
            F.log(F.col("n1w").cast("double") / F.col("big_b").cast("double")),
        )
        .otherwise(
            F.log(
                (F.coalesce(F.col("c1"), F.lit(0)) + 1).cast("double")
                / (F.col("n_toks") + F.col("vsz")).cast("double")
            )
        )
    )
    path = (
        F.when(
            F.col("cuv").isNotNull() & F.col("n1w").isNotNull(), F.lit("kn3")
        )
        .when(F.col("ncv").isNotNull() & F.col("n1w").isNotNull(), F.lit("kn2"))
        .when(F.col("n1w").isNotNull(), F.lit("cont"))
        .otherwise(F.lit("floor"))
    )
    return (
        joined.select(
            "doc_id",
            F.round(lp * 1e6).cast("long").alias("lp_micro"),
            path.alias("path"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            F.sum(F.when(F.col("path") == "kn3", 1).otherwise(0))
            .cast("long")
            .alias("n_kn3"),
            F.sum(F.when(F.col("path") == "kn2", 1).otherwise(0))
            .cast("long")
            .alias("n_kn2"),
            F.sum(F.when(F.col("path") == "cont", 1).otherwise(0))
            .cast("long")
            .alias("n_cont"),
            F.sum(F.when(F.col("path") == "floor", 1).otherwise(0))
            .cast("long")
            .alias("n_floor"),
            F.sum("lp_micro").alias("lp_sum_micro"),
        )
    )


def text_kneser_ney_trigram(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "text")
    train = d.where(F.col("doc_id") % _HOLDOUT_MOD != 0)
    heldout = d.where(F.col("doc_id") % _HOLDOUT_MOD == 0)
    return kn3_doc_scores(train, heldout).select(
        "doc_id",
        "n_trigrams",
        "n_kn3",
        "n_kn2",
        "n_cont",
        "n_floor",
        "lp_sum_micro",
        F.round(
            F.col("lp_sum_micro") / (F.col("n_trigrams") * 1e6), 4
        ).alias("avg_logprob"),
    )


def text_kneser_ney_bigram(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "text")
    train = d.where(F.col("doc_id") % _HOLDOUT_MOD != 0)
    heldout = d.where(F.col("doc_id") % _HOLDOUT_MOD == 0)
    return kn_doc_scores(train, heldout).select(
        "doc_id",
        "n_bigrams",
        "n_kn",
        "n_cont",
        "n_floor",
        "lp_sum_micro",
        F.round(
            F.col("lp_sum_micro") / (F.col("n_bigrams") * 1e6), 4
        ).alias("avg_logprob"),
    )


_ORACLE = f"""
WITH tr AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS arr
  FROM documents WHERE doc_id % {_HOLDOUT_MOD} != 0
),
ho AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS arr
  FROM documents WHERE doc_id % {_HOLDOUT_MOD} = 0
),
bic AS (
  SELECT arr[x] AS u, arr[x + 1] AS w, CAST(count(*) AS BIGINT) AS cuw
  FROM tr, UNNEST(generate_series(1, len(arr) - 1)) AS g(x)
  WHERE len(arr) >= 2
  GROUP BY 1, 2
),
ctx AS (
  SELECT u, CAST(sum(cuw) AS BIGINT) AS cu, CAST(count(*) AS BIGINT) AS n1u
  FROM bic GROUP BY u
),
cont AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n1w FROM bic GROUP BY w
),
uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(arr) AS tok FROM tr) WHERE len(tok) > 0 GROUP BY tok
),
bnv AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM bic) AS big_b,
         (SELECT CAST(sum(c1) AS BIGINT) FROM uni) AS n_toks,
         (SELECT CAST(count(*) AS BIGINT) FROM uni) AS v
),
h AS (
  SELECT doc_id, arr[x] AS u, arr[x + 1] AS w
  FROM ho, UNNEST(generate_series(1, len(arr) - 1)) AS g(x)
  WHERE len(arr) >= 2
),
scored AS (
  SELECT h.doc_id,
         CASE WHEN c.cu IS NOT NULL AND n.n1w IS NOT NULL THEN 'kn'
              WHEN n.n1w IS NOT NULL THEN 'cont'
              ELSE 'floor' END AS path,
         CAST(round(CASE
           WHEN c.cu IS NOT NULL AND n.n1w IS NOT NULL THEN
             ln(CAST(greatest(4 * coalesce(b.cuw, 0) - 3, 0) * v.big_b
                     + 3 * c.n1u * n.n1w AS DOUBLE)
                / CAST(4 * c.cu * v.big_b AS DOUBLE))
           WHEN n.n1w IS NOT NULL THEN
             ln(CAST(n.n1w AS DOUBLE) / CAST(v.big_b AS DOUBLE))
           ELSE
             ln(CAST(coalesce(u2.c1, 0) + 1 AS DOUBLE)
                / CAST(v.n_toks + v.v AS DOUBLE))
         END * 1000000, 0) AS BIGINT) AS lp_micro
  FROM h
  LEFT JOIN bic b ON b.u = h.u AND b.w = h.w
  LEFT JOIN ctx c ON c.u = h.u
  LEFT JOIN cont n ON n.w = h.w
  LEFT JOIN uni u2 ON u2.tok = h.w
  CROSS JOIN bnv v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN path = 'kn' THEN 1 ELSE 0 END) AS BIGINT) AS n_kn,
       CAST(sum(CASE WHEN path = 'cont' THEN 1 ELSE 0 END) AS BIGINT) AS n_cont,
       CAST(sum(CASE WHEN path = 'floor' THEN 1 ELSE 0 END) AS BIGINT) AS n_floor,
       CAST(sum(lp_micro) AS BIGINT) AS lp_sum_micro,
       round(sum(lp_micro) / (count(*) * 1000000.0), 4) AS avg_logprob
FROM scored
GROUP BY doc_id
"""

_ORACLE3 = f"""
WITH tr AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS arr
  FROM documents WHERE doc_id % {_HOLDOUT_MOD} != 0
),
ho AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS arr
  FROM documents WHERE doc_id % {_HOLDOUT_MOD} = 0
),
tric AS (
  SELECT arr[x] AS u, arr[x + 1] AS v, arr[x + 2] AS w,
         CAST(count(*) AS BIGINT) AS c3
  FROM tr, UNNEST(generate_series(1, len(arr) - 2)) AS g(x)
  WHERE len(arr) >= 3
  GROUP BY 1, 2, 3
),
ctx3 AS (
  SELECT u, v, CAST(sum(c3) AS BIGINT) AS cuv,
         CAST(count(*) AS BIGINT) AS n1uv
  FROM tric GROUP BY u, v
),
mid AS (
  SELECT v, w, CAST(count(*) AS BIGINT) AS ncvw FROM tric GROUP BY v, w
),
midctx AS (
  SELECT v, CAST(sum(ncvw) AS BIGINT) AS ncv,
         CAST(count(*) AS BIGINT) AS ntv
  FROM mid GROUP BY v
),
cont AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n1w FROM mid GROUP BY w
),
uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(arr) AS tok FROM tr) WHERE len(tok) > 0 GROUP BY tok
),
bnv AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM mid) AS big_b,
         (SELECT CAST(sum(c1) AS BIGINT) FROM uni) AS n_toks,
         (SELECT CAST(count(*) AS BIGINT) FROM uni) AS v
),
h AS (
  SELECT doc_id, arr[x] AS u, arr[x + 1] AS v, arr[x + 2] AS w
  FROM ho, UNNEST(generate_series(1, len(arr) - 2)) AS g(x)
  WHERE len(arr) >= 3
),
scored AS (
  SELECT h.doc_id,
         CASE WHEN c.cuv IS NOT NULL AND n.n1w IS NOT NULL THEN 'kn3'
              WHEN mc.ncv IS NOT NULL AND n.n1w IS NOT NULL THEN 'kn2'
              WHEN n.n1w IS NOT NULL THEN 'cont'
              ELSE 'floor' END AS path,
         CAST(round(CASE
           WHEN c.cuv IS NOT NULL AND n.n1w IS NOT NULL THEN
             ln(CAST(greatest(4 * coalesce(t.c3, 0) - 3, 0) * 4 * mc.ncv
                       * b.big_b
                     + 3 * c.n1uv
                       * (greatest(4 * coalesce(m.ncvw, 0) - 3, 0) * b.big_b
                          + 3 * mc.ntv * n.n1w) AS DOUBLE)
                / CAST(16 * c.cuv * mc.ncv * b.big_b AS DOUBLE))
           WHEN mc.ncv IS NOT NULL AND n.n1w IS NOT NULL THEN
             ln(CAST(greatest(4 * coalesce(m.ncvw, 0) - 3, 0) * b.big_b
                     + 3 * mc.ntv * n.n1w AS DOUBLE)
                / CAST(4 * mc.ncv * b.big_b AS DOUBLE))
           WHEN n.n1w IS NOT NULL THEN
             ln(CAST(n.n1w AS DOUBLE) / CAST(b.big_b AS DOUBLE))
           ELSE
             ln(CAST(coalesce(u2.c1, 0) + 1 AS DOUBLE)
                / CAST(b.n_toks + b.v AS DOUBLE))
         END * 1000000, 0) AS BIGINT) AS lp_micro
  FROM h
  LEFT JOIN tric t ON t.u = h.u AND t.v = h.v AND t.w = h.w
  LEFT JOIN ctx3 c ON c.u = h.u AND c.v = h.v
  LEFT JOIN mid m ON m.v = h.v AND m.w = h.w
  LEFT JOIN midctx mc ON mc.v = h.v
  LEFT JOIN cont n ON n.w = h.w
  LEFT JOIN uni u2 ON u2.tok = h.w
  CROSS JOIN bnv b
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(sum(CASE WHEN path = 'kn3' THEN 1 ELSE 0 END) AS BIGINT) AS n_kn3,
       CAST(sum(CASE WHEN path = 'kn2' THEN 1 ELSE 0 END) AS BIGINT) AS n_kn2,
       CAST(sum(CASE WHEN path = 'cont' THEN 1 ELSE 0 END) AS BIGINT) AS n_cont,
       CAST(sum(CASE WHEN path = 'floor' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_floor,
       CAST(sum(lp_micro) AS BIGINT) AS lp_sum_micro,
       round(sum(lp_micro) / (count(*) * 1000000.0), 4) AS avg_logprob
FROM scored
GROUP BY doc_id
"""

QUERIES = {
    "text_kneser_ney_bigram": QuerySpec(text_kneser_ney_bigram, _ORACLE),
    "text_kneser_ney_trigram": QuerySpec(text_kneser_ney_trigram, _ORACLE3),
}
