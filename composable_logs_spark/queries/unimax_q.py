"""UniMax language sampling (Chung et al. 2023) — the fifth member of
the mixture family (hand-set target shares, temperature scaling,
DoReMi reweighting, per-domain caps): allocate a token/doc budget as
UNIFORMLY as possible across languages, but never take more than _E
epochs of any language's data. Low-resource languages stop at their
epoch cap and the leftover budget redistributes to the rest — the
water-filling allocation the paper shows beats temperature sampling at
scale. Reference: no mixture surface (north-star scope).

Exact integer water-filling, no iteration and no driver loop: with
capacities c_l = _E * n_l sorted ascending, the allocation is
``min(c_l, t)`` for the water level t of the unique valid split s
(languages ranked <= s are fully capped; the rest share the remaining
budget evenly, floored). Every candidate split's level is
``t_s = (B - prefix_s) div (K - s)``; split s is valid iff the s-th
capacity fits under t_s and the (s+1)-th exceeds it. The real-valued
split stays valid under floor division (c integer and c <= t real
implies c <= floor(t)), and ties pick the SMALLEST valid s so both
engines choose identically.

100 TB shape: everything after the one corpus-linear groupBy(lang) is
K-row arithmetic (K = language count) — ranks and prefix sums come
from a broadcast inequality self-join over the K-row counts relation
(the hll_cumulative / text_auc coarse-level pattern, NEVER a
partition-less window), split validation is a 3-way K-row broadcast
join, and the chosen level is a broadcast 1-row min. No doc row is
touched after the first aggregate; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_E = 2  # epoch cap: never take more than 2 passes over a language
_BUDGET_NUM, _BUDGET_DEN = 3, 5  # budget = 60% of the corpus


def _quotas(d: DataFrame, spark: SparkSession) -> DataFrame:
    """Water-filled quotas (lang, n_available, cap, quota) from a
    frame of (lang) rows — the shared core of the report query
    (``mix_unimax_sample``) and the draw query (``mix_unimax_draw``)."""
    counts = d.groupBy("lang").agg(F.count("*").alias("n_available")).withColumn(
        "cap", F.lit(_E) * F.col("n_available")
    )
    tot = counts.agg(
        F.sum("n_available").alias("n_total"), F.count("*").alias("k")
    ).select(
        "n_total",
        "k",
        F.expr(f"(n_total * {_BUDGET_NUM}) div {_BUDGET_DEN}").alias("budget"),
    )
    # rank + inclusive prefix over the K-row counts relation, via a
    # broadcast lexicographic (cap, lang) inequality self-join
    lex_le = (F.col("b.cap") < F.col("a.cap")) | (
        (F.col("b.cap") == F.col("a.cap")) & (F.col("b.lang") <= F.col("a.lang"))
    )
    ranked = (
        counts.alias("a")
        .join(F.broadcast(counts.alias("b")), lex_le)
        .groupBy(
            F.col("a.lang").alias("lang"),
            F.col("a.n_available").alias("n_available"),
            F.col("a.cap").alias("cap"),
        )
        .agg(F.count("*").alias("r"), F.sum("b.cap").alias("prefix"))
    )
    # split candidates s = 0..K: s=r rows carry (prefix_s, c_at_rank_s);
    # the s=0 row has no capped language below it
    zero = spark.range(1).select(
        F.lit(0).cast("long").alias("s"),
        F.lit(0).cast("long").alias("prefix"),
        F.lit(None).cast("long").alias("c_s"),
    )
    splits = ranked.select(
        F.col("r").alias("s"), "prefix", F.col("cap").alias("c_s")
    ).unionByName(zero)
    nxt = ranked.select((F.col("r") - 1).alias("s"), F.col("cap").alias("c_next"))
    cand = (
        splits.crossJoin(F.broadcast(tot))
        .join(F.broadcast(nxt), "s", "left")
        .withColumn(
            "t",
            F.when(
                F.col("s") < F.col("k"),
                F.expr("(budget - prefix) div (k - s)"),
            ),
        )
        .withColumn(
            "valid",
            (
                F.col("c_s").isNull() | (F.col("c_s") <= F.col("t"))
                | (F.col("s") == F.col("k"))
            )
            & (
                F.col("c_next").isNull()  # s = K: everything capped
                | (F.col("c_next") > F.col("t"))
            )
            & (
                (F.col("s") < F.col("k"))
                | (F.col("prefix") <= F.col("budget"))  # s = K feasibility
            ),
        )
    )
    chosen = (
        cand.where("valid")
        .agg(F.min(F.struct("s", "t")).alias("best"))
        .select(F.col("best.s").alias("s_star"), F.col("best.t").alias("t_star"))
    )
    return ranked.crossJoin(F.broadcast(chosen)).select(
        "lang",
        "n_available",
        "cap",
        F.when(F.col("r") <= F.col("s_star"), F.col("cap"))
        .otherwise(F.least("cap", "t_star"))
        .alias("quota"),
    )


def mix_unimax_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("lang")
    return (
        _quotas(d, spark)
        .withColumn("epochs_milli", F.expr("(1000 * quota) div n_available"))
        .orderBy("lang")
    )


def mix_unimax_draw(spark: SparkSession, sf: str) -> DataFrame:
    """Execute the UniMax allocation: the md5-ordered deterministic
    per-language draw to quota — the exact mechanism
    ``mix_temperature_sample`` and the DoReMi sampler use — reporting
    realized counts, shares, and a digest of WHICH docs were drawn, so
    UniMax's output can feed the same downstream as its four mixture
    siblings.

    The epoch cap ``_E`` = 2 permits quota > n_available (a language
    its own size can't fill the level gets up to 2 passes); the
    single-pass draw here then takes every doc (n_sampled =
    n_available) — repetition beyond the first epoch is a training-
    loader concern, and epochs_milli in the report query already
    carries it. Zero-quota languages appear with n_sampled = 0 and the
    empty-set digest, never silently vanish (the temperature-mix left-
    join + coalesce discipline).

    100 TB shape: quotas are K-row broadcast arithmetic (see module
    docstring); the draw adds one lang-partitioned row_number window
    over doc rows (the shared mixture-draw cost, identical to
    temperature/DoReMi) and a broadcast quota join."""
    from pyspark.sql import Window as W

    d = load(spark, sf, "documents").select("doc_id", "lang")
    q = _quotas(d.select("lang"), spark)
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    sampled = (
        d.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(q.select("lang", "quota")), "lang")
        .where(F.col("rn") <= F.col("quota"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("sampled_digest"),
        )
    )
    # coalesce: sum over an EMPTY sampled frame (the degenerate corpus)
    # is null, not 0
    stot = sampled.agg(F.coalesce(F.sum("n_sampled"), F.lit(0)).alias("s_total"))
    return (
        q.join(sampled, "lang", "left")
        .withColumn("n_sampled", F.coalesce("n_sampled", F.lit(0).cast("long")))
        .withColumn("sampled_digest", F.coalesce("sampled_digest", F.md5(F.lit(""))))
        .crossJoin(F.broadcast(stot))
        .select(
            "lang",
            "n_available",
            "quota",
            "n_sampled",
            # s_total = 0 only in the degenerate budget < K corpus
            # (every language's level floors to 0): report 0, not null
            F.expr(
                "CASE WHEN s_total = 0 THEN CAST(0 AS BIGINT)"
                " ELSE (1000 * n_sampled) div s_total END"
            ).alias("realized_share_milli"),
            "sampled_digest",
        )
        .orderBy("lang")
    )


# quota-level SQL (lang, n_available, cap, quota) — shared by the
# report oracle and the draw oracle
_QUOTA_SQL = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_available,
         CAST({_E} * count(*) AS BIGINT) AS cap
  FROM documents GROUP BY lang
),
tot AS (
  SELECT CAST(sum(n_available) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS k,
         (CAST(sum(n_available) AS BIGINT) * {_BUDGET_NUM}) // {_BUDGET_DEN}
           AS budget
  FROM counts
),
ranked AS (
  SELECT a.lang, a.n_available, a.cap,
         CAST(count(*) AS BIGINT) AS r,
         CAST(sum(b.cap) AS BIGINT) AS prefix
  FROM counts a JOIN counts b
    ON b.cap < a.cap OR (b.cap = a.cap AND b.lang <= a.lang)
  GROUP BY a.lang, a.n_available, a.cap
),
splits AS (
  SELECT r AS s, prefix, cap AS c_s FROM ranked
  UNION ALL
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)
),
cand AS (
  SELECT sp.s, sp.prefix, sp.c_s, nx.cap AS c_next, t.k, t.budget,
         CASE WHEN sp.s < t.k
              THEN (t.budget - sp.prefix) // (t.k - sp.s) END AS tl
  FROM splits sp
  CROSS JOIN tot t
  LEFT JOIN ranked nx ON nx.r = sp.s + 1
),
chosen AS (
  SELECT s AS s_star, tl AS t_star
  FROM cand
  WHERE (c_s IS NULL OR c_s <= tl OR s = k)
    AND (c_next IS NULL OR c_next > tl)
    AND (s < k OR prefix <= budget)
  ORDER BY s
  LIMIT 1
)
SELECT r.lang, r.n_available, r.cap,
       CASE WHEN r.r <= c.s_star THEN r.cap
            ELSE least(r.cap, c.t_star) END AS quota
FROM ranked r CROSS JOIN chosen c
"""


UNIMAX_SQL = f"""
SELECT lang, n_available, cap, quota,
       (1000 * quota) // n_available AS epochs_milli
FROM ({_QUOTA_SQL}) q
ORDER BY lang
"""


UNIMAX_DRAW_SQL = f"""
WITH q AS ({_QUOTA_SQL}),
ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
),
sampled AS (
  SELECT r.lang,
         CAST(count(*) AS BIGINT) AS n_sampled,
         md5(array_to_string(
               list(CAST(r.doc_id AS VARCHAR) ORDER BY r.doc_id), ','))
           AS sampled_digest
  FROM ranked r JOIN q USING (lang)
  WHERE r.rn <= q.quota
  GROUP BY r.lang
),
stot AS (
  SELECT CAST(coalesce(sum(n_sampled), 0) AS BIGINT) AS s_total FROM sampled
)
SELECT q.lang, q.n_available, q.quota,
       CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
       CASE WHEN t.s_total = 0 THEN CAST(0 AS BIGINT)
            ELSE (1000 * CAST(coalesce(s.n_sampled, 0) AS BIGINT)) // t.s_total
       END AS realized_share_milli,
       coalesce(s.sampled_digest, md5('')) AS sampled_digest
FROM q LEFT JOIN sampled s USING (lang) CROSS JOIN stot t
ORDER BY q.lang
"""


QUERIES = {
    "mix_unimax_sample": QuerySpec(mix_unimax_sample, UNIMAX_SQL),
    "mix_unimax_draw": QuerySpec(mix_unimax_draw, UNIMAX_DRAW_SQL),
}
