"""DSIR-style importance sampling (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling") — select raw-corpus
documents that look like a TARGET domain, scored by hashed-bigram
importance weights:

    w(doc) = sum over doc bigrams of  log p_target(bucket) - log p_raw(bucket)

with bigram features hashed into B buckets (the paper's hashed n-gram
trick: model size is B, not vocab^2) and add-1 smoothing per bucket.
Here the target domain is the corpus' ``lang = 'en'`` slice and the
raw distribution is the whole corpus — the everyday "find more text
like my curated set" selection job.

Scale shape: one corpus pass emits (doc_id, bucket) bigram rows; the
TWO bucket models are one hash agg each over B=8192 keys; the scored
bucket table (B rows) broadcasts back onto the doc-bigram stream; the
per-doc weight is a map-side-combinable integer sum. Top-K lowers to
TakeOrderedAndProject. No stage scales with anything but corpus size.

Cross-engine exactness: each bucket's log-ratio is rounded ONCE to
integer micro-nats (ln((c_t+1)/(N_t+B)) - ln((c_r+1)/(N_r+B)), the
unigram/bigram-LM recipe); per-doc sums are exact integer adds, so
summation order cannot flip the hash. Ties in the top-K break on
doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_B = 8192       # hashed feature buckets
_TOP_K = 100    # selected documents
_TARGET_LANG = "en"


def _doc_buckets(d: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket) — one row per bigram occurrence."""
    toks = d.select(
        "doc_id", "lang", F.split(F.trim(F.lower("text")), r"\s+").alias("arr")
    )
    return (
        toks.where(F.size("arr") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(arr) - 1),"
                    " i -> concat(element_at(arr, i), ' ',"
                    " element_at(arr, i + 1)))"
                )
            ).alias("bg"),
        )
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("bg"), 1, 15), 16, 10).cast("long")
                % _B
            ).alias("bucket"),
        )
    )


def dsir_select_topk(spark: SparkSession, sf: str) -> DataFrame:
    # cached only while the bucket model is built, released below —
    # a corpus-sized cache must not linger for the rest of the session
    b = _doc_buckets(load(spark, sf, "documents")).cache()
    tgt = b.where(F.col("lang") == _TARGET_LANG)
    # bucket counts for target and raw; totals as 1-row broadcasts
    ct = tgt.groupBy("bucket").agg(F.count("*").alias("c_t"))
    cr = b.groupBy("bucket").agg(F.count("*").alias("c_r"))
    nt = tgt.agg(F.count("*").alias("n_t"))
    nr = b.agg(F.count("*").alias("n_r"))
    model = (
        cr.join(ct, "bucket", "left")
        .na.fill({"c_t": 0})
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "bucket",
            F.round(
                (
                    F.log((F.col("c_t") + 1) / (F.col("n_t") + F.lit(_B)))
                    - F.log((F.col("c_r") + 1) / (F.col("n_r") + F.lit(_B)))
                )
                * 1e6
            )
            .cast("long")
            .alias("lw_micro"),
        )
    )
    # pin the tiny (<= B rows) model and drop the corpus-sized bucket
    # cache: the final scoring pass below recomputes the buckets once
    # from source instead of holding one row per corpus bigram in
    # executor memory for the remainder of the session
    model = model.cache()
    model.count()
    b.unpersist()
    scored = (
        b.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("lw_micro").alias("w_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("w_micro") / F.lit(1e6), 4).alias("weight"),
        )
    )
    return scored.orderBy(F.col("w_micro").desc(), "doc_id").limit(_TOP_K).select(
        "doc_id", "n_bigrams", "weight"
    )


DSIR_SQL = f"""
WITH arrs AS (
  SELECT doc_id, lang,
         string_split_regex(trim(lower(text)), '\\s+') AS arr
  FROM documents
),
b AS (
  SELECT doc_id, lang,
         CAST('0x' || substring(md5(arr[x] || ' ' || arr[x + 1]), 1, 15)
              AS BIGINT) % {_B} AS bucket
  FROM arrs, UNNEST(generate_series(1, len(arr) - 1)) AS u(x)
  WHERE len(arr) >= 2
),
ct AS (SELECT bucket, count(*) AS c_t FROM b
       WHERE lang = '{_TARGET_LANG}' GROUP BY bucket),
cr AS (SELECT bucket, count(*) AS c_r FROM b GROUP BY bucket),
nt AS (SELECT count(*) AS n_t FROM b WHERE lang = '{_TARGET_LANG}'),
nr AS (SELECT count(*) AS n_r FROM b),
model AS (
  SELECT cr.bucket,
         CAST(round((ln((coalesce(ct.c_t, 0) + 1)
                        / CAST((SELECT n_t FROM nt) + {_B} AS DOUBLE))
                     - ln((cr.c_r + 1)
                        / CAST((SELECT n_r FROM nr) + {_B} AS DOUBLE)))
                    * 1000000, 0) AS BIGINT) AS lw_micro
  FROM cr LEFT JOIN ct USING (bucket)
),
scored AS (
  SELECT b.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(m.lw_micro) AS BIGINT) AS w_micro
  FROM b JOIN model m USING (bucket)
  GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams, round(w_micro / 1000000.0, 4) AS weight
FROM scored
ORDER BY w_micro DESC, doc_id
LIMIT {_TOP_K}
"""


QUERIES = {
    "dsir_select_topk": QuerySpec(dsir_select_topk, DSIR_SQL),
}
