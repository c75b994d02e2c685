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


def mix_unimax_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("lang")
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
    return (
        ranked.crossJoin(F.broadcast(chosen))
        .select(
            "lang",
            "n_available",
            "cap",
            F.when(
                F.col("r") <= F.col("s_star"), F.col("cap")
            )
            .otherwise(F.least("cap", "t_star"))
            .alias("quota"),
        )
        .withColumn("epochs_milli", F.expr("(1000 * quota) div n_available"))
        .orderBy("lang")
    )


UNIMAX_SQL = f"""
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
            ELSE least(r.cap, c.t_star) END AS quota,
       (1000 * CASE WHEN r.r <= c.s_star THEN r.cap
                    ELSE least(r.cap, c.t_star) END) // r.n_available
         AS epochs_milli
FROM ranked r CROSS JOIN chosen c
ORDER BY r.lang
"""


QUERIES = {
    "mix_unimax_sample": QuerySpec(mix_unimax_sample, UNIMAX_SQL),
}
