"""Chi-square term–class feature selection (Yang & Pedersen 1997,
"A Comparative Study on Feature Selection in Text Categorization"):
for every (term, class) pair, score how far the term's document
frequency inside the class departs from independence, then keep the
top-k terms per class — the classic pre-training step that picks the
vocabulary a linear classifier (``lang_classifier_q``,
``text_classifier_q``) is worth training on, and the corpus-curation
question "which tokens *define* this domain/language slice?".

With per-class contingency counts over DISTINCT (doc, term) presence

    A = docs in class containing the term      B = df_t - A
    C = n_c - A                                D = N - n_c - B

the statistic collapses to the well-known 2x2 form

    chi2(t, c) = N * (A*N - df_t*n_c)^2
                 / (df_t * (N - df_t) * n_c * (N - n_c))

(the identity A*D - B*C = A*N - df_t*n_c removes B/C/D from the
computation entirely — only A, df_t, n_c, N are ever materialised).

Determinism across engines: every input count is an exact integer;
chi2 is evaluated as ONE identically-parenthesised double expression
on both engines (each IEEE op is correctly rounded, so identical
expression tree + exact integer inputs = bit-identical doubles), the
top-k ordering compares those raw doubles (ties broken on term), and
only the REPORTED value is rounded to 4dp.

100 TB shape: one tokenize pass -> distinct (doc, term, lang) ->
two aggregations (per-(term,class) A and per-term df_t) shuffled on
the ~uniform term key; class sizes (|classes| rows) and N (1 row)
ride broadcast joins; the (term x class) score frame never exceeds
|vocab| * |classes| rows and the per-class top-k is the salted
two-phase merge (``similarity_q._topk_two_phase`` pattern), so no
window ever sees a vocab-sized partition. Terms in a class's
complement only (A = 0) still score via the df_t frame — the grid is
df_t x classes, not observed pairs, built with one broadcast of the
|classes|-row class table.

Reference anchor: none (north-star scope, SURVEY.md §2.10) — the
reference has no feature-selection surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load

_MIN_DF = 5  # ignore terms seen in < 5 docs: chi2 is unstable there
_TOP_K = 5
_SALT_BUCKETS = 32


def _chi2_double(a, df_t, n_c, n):
    """The shared chi2 expression — ONE shape on both engines."""
    dev = a * n - df_t * n_c
    return (n * (dev * dev)) / (df_t * (n - df_t) * n_c * (n - n_c))


def chi2_feature_select(
    d: DataFrame, min_df: int = _MIN_DF, top_k: int = _TOP_K
) -> DataFrame:
    """Top-k chi2-scored terms per class over a (doc_id, lang, text)
    frame — the reusable core; the registered query binds it to the
    ``documents`` table."""
    # distinct (doc, lang, term) presence — chi2 is a document-frequency
    # statistic, so within-doc repeats must not count
    pres = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    # per-(term, class) presence count A — shuffle on the ~uniform term key
    a_tc = pres.groupBy("term", F.col("lang").alias("cls")).agg(
        F.count("*").alias("a")
    )
    # per-term global document frequency, with the min-df / not-everywhere cut
    n_tot = d.agg(F.count("*").alias("n"))
    df_t = (
        pres.groupBy("term")
        .agg(F.count("*").alias("df_t"))
        .crossJoin(F.broadcast(n_tot))
        .where((F.col("df_t") >= min_df) & (F.col("df_t") < F.col("n")))
    )
    # class sizes: |classes| rows, broadcast
    n_c = d.groupBy(F.col("lang").alias("cls")).agg(F.count("*").alias("n_c"))
    # grid = surviving terms x classes (a term absent from a class still
    # scores: A = 0 encodes negative association)
    grid = (
        df_t.crossJoin(F.broadcast(n_c))
        .join(a_tc, ["term", "cls"], "left")
        .na.fill({"a": 0})
    )
    scored = grid.select(
        "term",
        "cls",
        "a",
        "df_t",
        _chi2_double(
            F.col("a").cast("double"),
            F.col("df_t").cast("double"),
            F.col("n_c").cast("double"),
            F.col("n").cast("double"),
        ).alias("chi2_raw"),
    )
    # salted two-phase per-class top-k: local top-k inside hash-salt
    # buckets, global merge over buckets*k rows — no vocab-sized window
    order = [F.col("chi2_raw").desc(), F.col("term")]
    local = (
        scored.withColumn(
            "_salt", F.pmod(F.hash("term"), F.lit(_SALT_BUCKETS))
        )
        .withColumn(
            "_lr",
            F.row_number().over(W.partitionBy("cls", "_salt").orderBy(*order)),
        )
        .where(F.col("_lr") <= top_k)
    )
    return (
        local.withColumn(
            "rank",
            F.row_number().over(W.partitionBy("cls").orderBy(*order)).cast("int"),
        )
        .where(F.col("rank") <= top_k)
        .select(
            "cls",
            "rank",
            "term",
            F.round("chi2_raw", 4).alias("chi2"),
            F.col("a").alias("df_in_class"),
            F.col("df_t").alias("df_total"),
        )
        .orderBy("cls", "rank")
    )


def text_chi2_feature_select(spark: SparkSession, sf: str) -> DataFrame:
    return chi2_feature_select(load(spark, sf, "documents"))


_CHI2_SQL = f"""
WITH pres AS (
  SELECT DISTINCT doc_id, lang, term
  FROM (
    SELECT doc_id, lang,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
    FROM documents
  ) WHERE term <> ''
),
a_tc AS (
  SELECT term, lang AS cls, count(*) AS a FROM pres GROUP BY term, lang
),
n_tot AS (SELECT count(*) AS n FROM documents),
df_t AS (
  SELECT term, count(*) AS df_t, n
  FROM pres CROSS JOIN n_tot
  GROUP BY term, n
  HAVING count(*) >= {_MIN_DF} AND count(*) < n
),
n_c AS (SELECT lang AS cls, count(*) AS n_c FROM documents GROUP BY lang),
grid AS (
  SELECT d.term, c.cls, coalesce(a.a, 0) AS a, d.df_t, c.n_c, d.n
  FROM df_t d CROSS JOIN n_c c
  LEFT JOIN a_tc a ON a.term = d.term AND a.cls = c.cls
),
scored AS (
  SELECT term, cls, a, df_t,
         (CAST(n AS DOUBLE) *
          ((CAST(a AS DOUBLE) * CAST(n AS DOUBLE)
            - CAST(df_t AS DOUBLE) * CAST(n_c AS DOUBLE))
           * (CAST(a AS DOUBLE) * CAST(n AS DOUBLE)
              - CAST(df_t AS DOUBLE) * CAST(n_c AS DOUBLE))))
         / (CAST(df_t AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(df_t AS DOUBLE))
            * CAST(n_c AS DOUBLE)
            * (CAST(n AS DOUBLE) - CAST(n_c AS DOUBLE))) AS chi2_raw
  FROM grid
),
ranked AS (
  SELECT cls, term, a, df_t, chi2_raw,
         CAST(row_number() OVER (
           PARTITION BY cls ORDER BY chi2_raw DESC, term) AS INT) AS rank
  FROM scored
)
SELECT cls, rank, term, round(chi2_raw, 4) AS chi2,
       a AS df_in_class, df_t AS df_total
FROM ranked WHERE rank <= {_TOP_K}
ORDER BY cls, rank
"""

QUERIES = {
    "text_chi2_feature_select": QuerySpec(
        fn=text_chi2_feature_select, oracle=_CHI2_SQL
    ),
}
