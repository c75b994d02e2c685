"""Corpus-governance operators: per-domain caps, cross-document n-gram
overlap, and target-mixture sampling — the three knobs every large-scale
training-data pipeline turns after cleaning and dedup:

- ``domain_cap_sample``: cap each domain (the ``source`` column stands
  in for registrable domain) at K documents, keeping the best K by a
  deterministic quality key — the standard guard against one crawl
  host dominating the mixture (C4/RefinedWeb both apply per-domain
  caps). Rank-within-group <= K lowers to Spark's WindowGroupLimit
  pushdown: each partition keeps a K-row heap per group BEFORE the
  window sort, so per-task state is K x |groups-in-task|, not the
  group's rows.
- ``crossdoc_ngram_overlap``: per-document fraction of its word
  3-gram shingles that occur in >= 2 distinct documents — the
  approximate form of substring-level dedup ("Deduplicating Training
  Data Makes Language Models Better", Lee et al. 2022): documents that
  are mostly made of corpus-repeated n-grams are boilerplate/templated
  and get flagged. Inverted-index shape: one distinct + one hash agg
  for document frequency, one equi-join back — never an all-pairs
  comparison; runs over the planted near-dup corpus (``dedup_q``) so
  the operator has known positives.
- ``mix_sources_to_target``: deterministic hash-sampling that realises
  a target language mixture exactly: the largest achievable corpus with
  proportions P is lambda = min_l(n_l / P_l) documents, each language
  contributing floor(lambda * P_l) docs chosen by md5 order — the data
  mixing step (pile/DoReMi-style static mixtures), coordination-free
  and reproducible because the "random" order is a content hash.

All three are pure DataFrame programs (no UDFs), fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load

_DOMAIN_CAP = 15

# target language mixture (sums to 1)
_MIX_TARGET = {"en": 0.4, "zh": 0.2, "de": 0.15, "es": 0.15, "fr": 0.1}


# ---------------------------------------------------------------------------
def domain_cap_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "source", "n_chars")
    # per-source totals need no window — keep them off the sort branch
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    # deterministic quality key: longest first (stand-in for a model
    # quality score), doc_id tiebreak. The rank<=K FILTER (not a fold
    # into the aggregate) is what lets Spark's InferWindowGroupLimit
    # rewrite kick in: per-task K-row heaps per group before the sort.
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    kept = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _DOMAIN_CAP)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            # digest of the kept ids in rank order proves the SELECTION
            # is identical cross-engine, not just its size
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("rn", "doc_id"))),
                        lambda s: s["doc_id"].cast("string"),
                    ),
                )
            ).alias("kept_digest"),
        )
    )
    return counts.join(kept, "source").select(
        "source", "n_docs", "n_kept", "kept_digest"
    )


DOMAIN_CAP_SQL = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE rn <= {_DOMAIN_CAP}) AS BIGINT) AS n_kept,
       md5(array_to_string(
             list(CAST(doc_id AS VARCHAR) ORDER BY rn)
               FILTER (WHERE rn <= {_DOMAIN_CAP}), ',')) AS kept_digest
FROM ranked GROUP BY source
"""


# ---------------------------------------------------------------------------
def crossdoc_ngram_overlap(spark: SparkSession, sf: str) -> DataFrame:
    from .dedup_q import _near_dup_corpus, _shingles

    corpus = _near_dup_corpus(spark, sf)
    # shingles are distinct per doc already; hash to a 60-bit integer so
    # the docfreq shuffle ships 8-byte keys, not strings.
    # r14 (guide §3.3): pinned — both the docfreq agg and the join probe
    # read sh; un-materialized, the shingle+md5 pass ran once per side
    sh = corpus.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
        .cast("long")
        .alias("sh_h"),
    ).localCheckpoint(eager=True)
    docfreq = sh.groupBy("sh_h").agg(F.count("*").alias("dfreq"))
    per_doc = (
        sh.join(docfreq, "sh_h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum((F.col("dfreq") >= 2).cast("long")).alias("n_shared"),
        )
        .withColumn(
            "shared_ratio", F.round(F.col("n_shared") / F.col("n_ngrams"), 4)
        )
        .withColumn("flagged", F.col("shared_ratio") >= 0.5)
    )
    return per_doc


def _overlap_sql() -> str:
    from .dedup_q import _NEAR_DUP_CORPUS_SQL, _SHINGLES_SQL

    return f"""
WITH corpus AS ({_NEAR_DUP_CORPUS_SQL}),
sh AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(unnest({_SHINGLES_SQL})), 1, 15) AS BIGINT) AS sh_h
  FROM corpus
),
docfreq AS (
  SELECT sh_h, count(*) AS dfreq FROM sh GROUP BY sh_h
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       CAST(count(*) FILTER (WHERE d.dfreq >= 2) AS BIGINT) AS n_shared,
       round(count(*) FILTER (WHERE d.dfreq >= 2) / CAST(count(*) AS DOUBLE), 4)
         AS shared_ratio,
       round(count(*) FILTER (WHERE d.dfreq >= 2) / CAST(count(*) AS DOUBLE), 4)
         >= 0.5 AS flagged
FROM sh s JOIN docfreq d USING (sh_h)
GROUP BY s.doc_id
"""


# ---------------------------------------------------------------------------
def mix_sources_to_target(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "lang")
    p = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in _MIX_TARGET.items()
        ]
    )
    counts = d.groupBy("lang").agg(F.count("*").alias("n_available")).withColumn(
        "target_share", p
    )
    lam = counts.agg(
        F.min(F.col("n_available") / F.col("target_share")).alias("lam")
    )
    quota = counts.crossJoin(F.broadcast(lam)).select(
        "lang",
        "n_available",
        "target_share",
        F.floor(F.col("lam") * F.col("target_share")).cast("long").alias("n_target"),
    )
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    sampled = (
        d.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(quota), "lang")
        .where(F.col("rn") <= F.col("n_target"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )
    per_lang = quota.join(sampled, "lang")
    total = sampled.agg(F.sum("n_sampled").alias("total_sampled"))
    return per_lang.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_available",
        F.round("target_share", 4).alias("target_share"),
        "n_sampled",
        F.round(F.col("n_sampled") / F.col("total_sampled"), 4).alias(
            "realized_share"
        ),
    )


# CAST to DOUBLE: a bare 0.4 literal is DECIMAL(2,1) in DuckDB, and
# BIGINT/DECIMAL division is decimal arithmetic — lam would then be
# computed differently from Spark's double path
_P_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN CAST({v} AS DOUBLE)" for k, v in _MIX_TARGET.items()
) + " END"

MIX_SQL = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_available,
         {_P_CASE} AS target_share
  FROM documents GROUP BY lang
),
lam AS (SELECT min(n_available / target_share) AS lam FROM counts),
quota AS (
  SELECT lang, n_available, target_share,
         CAST(floor(lam.lam * target_share) AS BIGINT) AS n_target
  FROM counts CROSS JOIN lam
),
ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
),
sampled AS (
  SELECT r.lang, CAST(count(*) AS BIGINT) AS n_sampled
  FROM ranked r JOIN quota q USING (lang)
  WHERE r.rn <= q.n_target
  GROUP BY r.lang
),
total AS (SELECT CAST(sum(n_sampled) AS BIGINT) AS total_sampled FROM sampled)
SELECT q.lang, q.n_available,
       round(q.target_share, 4) AS target_share,
       s.n_sampled,
       round(s.n_sampled / CAST(t.total_sampled AS DOUBLE), 4) AS realized_share
FROM quota q JOIN sampled s USING (lang) CROSS JOIN total t
"""


# ---------------------------------------------------------------------------
# Temperature sampling (the multilingual rebalancing of mBERT/XLM-R):
# instead of a HAND-CHOSEN target mixture, the target is derived from
# the observed counts, p_l ∝ n_l^(1/T) — T>1 flattens the distribution,
# upweighting low-resource languages. T is pinned to 2 so the exponent
# is sqrt(): IEEE-754 specifies sqrt as correctly rounded, so BOTH
# engines compute the bit-identical double (pow(x, 1/T) for general T
# is NOT correctly rounded and could diverge cross-engine). The sqrt is
# immediately scaled and floored to an int64 weight, after which every
# share/quota is exact integer arithmetic.
_TEMP_BUDGET_NUM, _TEMP_BUDGET_DEN = 3, 5  # sample 60% of the corpus


def mix_temperature_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "lang")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_available")).withColumn(
        "w", F.floor(F.sqrt(F.col("n_available").cast("double")) * 1e6).cast("long")
    )
    totals = counts.agg(
        F.sum("n_available").alias("n_total"), F.sum("w").alias("w_total")
    )
    quota = counts.crossJoin(F.broadcast(totals)).select(
        "lang",
        "n_available",
        "n_total",
        F.least(
            F.col("n_available"),
            F.expr(
                f"((n_total * {_TEMP_BUDGET_NUM}) div {_TEMP_BUDGET_DEN} * w)"
                " div w_total"
            ),
        ).alias("n_target"),
    )
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    sampled = (
        d.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(quota.select("lang", "n_target")), "lang")
        .where(F.col("rn") <= F.col("n_target"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )
    stot = sampled.agg(F.sum("n_sampled").alias("s_total"))
    # LEFT join + coalesce: a language whose integer quota floors to 0
    # contributes no sampled rows but must still appear in the mixture
    # report (n_sampled = 0), not silently vanish
    return (
        quota.join(sampled, "lang", "left")
        .withColumn("n_sampled", F.coalesce("n_sampled", F.lit(0).cast("long")))
        .crossJoin(F.broadcast(stot))
        .select(
            "lang",
            "n_available",
            "n_sampled",
            F.expr("(1000 * n_available) div n_total").alias("raw_share_milli"),
            F.expr("(1000 * n_sampled) div s_total").alias("temp_share_milli"),
        )
        .orderBy("lang")
    )


TEMP_MIX_SQL = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_available,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT) AS w
  FROM documents GROUP BY lang
),
totals AS (
  SELECT CAST(sum(n_available) AS BIGINT) AS n_total,
         CAST(sum(w) AS BIGINT) AS w_total
  FROM counts
),
quota AS (
  SELECT lang, n_available, n_total,
         least(n_available,
               ((n_total * {_TEMP_BUDGET_NUM}) // {_TEMP_BUDGET_DEN} * w)
               // w_total) AS n_target
  FROM counts CROSS JOIN totals
),
ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
),
sampled AS (
  SELECT r.lang, CAST(count(*) AS BIGINT) AS n_sampled
  FROM ranked r JOIN quota q USING (lang)
  WHERE r.rn <= q.n_target
  GROUP BY r.lang
),
stot AS (SELECT CAST(sum(n_sampled) AS BIGINT) AS s_total FROM sampled)
SELECT q.lang, q.n_available,
       CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
       (1000 * q.n_available) // q.n_total AS raw_share_milli,
       (1000 * CAST(coalesce(s.n_sampled, 0) AS BIGINT)) // t.s_total
         AS temp_share_milli
FROM quota q LEFT JOIN sampled s USING (lang) CROSS JOIN stot t
ORDER BY q.lang
"""


QUERIES = {
    "domain_cap_sample": QuerySpec(domain_cap_sample, DOMAIN_CAP_SQL),
    "crossdoc_ngram_overlap": QuerySpec(crossdoc_ngram_overlap, _overlap_sql()),
    "mix_sources_to_target": QuerySpec(mix_sources_to_target, MIX_SQL),
    "mix_temperature_sample": QuerySpec(mix_temperature_sample, TEMP_MIX_SQL),
}
