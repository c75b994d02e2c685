"""Training-data pipeline operators (north-star L-family extensions):
PII scrubbing, deterministic stratified sampling, chunk-level exact dedup.

All pure built-in expressions (regexp/md5/slice/explode) — no Python
UDFs — so they run JVM-side at 100 TB. Each has an exact DuckDB oracle.

Scale notes:
- pii_scrub is a narrow per-row map: no shuffle, streams through the scan.
- stratified sampling keys on md5(doc_id) so it needs NO shuffle and no
  coordination — every executor decides membership locally, and the same
  rows are picked on every engine/run (unlike rand()-based sampling).
  The final per-stratum count aggregate is the only (tiny) shuffle.
- chunk dedup explodes ~n_tokens/CHUNK rows per doc, then hash-aggregates
  on the 128-bit chunk hash: map-side partial aggregation absorbs most of
  the fan-out before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

# ---------------------------------------------------------------------------
# PII scrubbing: mask account-number-like digit runs (>=6 digits), report
# the scrubbed value and how many runs were masked. The real-world op is
# the same shape with a larger regex alternation (emails, phones, SSNs).
_ID_RUN = "[0-9]{6,}"
_MASK = "[ID]"


def pii_scrub_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace(F.col("c_name"), _ID_RUN, _MASK).alias("scrubbed_name"),
        F.regexp_count(F.col("c_name"), F.lit(_ID_RUN)).cast("int").alias("n_masked"),
    )


PII_SQL = f"""
SELECT c_custkey,
       regexp_replace(c_name, '{_ID_RUN}', '{_MASK}', 'g') AS scrubbed_name,
       CAST(len(regexp_extract_all(c_name, '{_ID_RUN}')) AS INT) AS n_masked
FROM customer
"""


# ---------------------------------------------------------------------------
# Deterministic stratified sampling: per-stratum keep-rates, membership
# decided by a hash of the stable key (md5 prefix mod 100) — reproducible
# across engines, runs, and cluster sizes, with zero shuffle for the
# membership decision itself.
_RATE_DEFAULT = 10  # percent
_RATE_BOOSTED = 25
_BOOSTED_SOURCES = ["src1", "src2", "src3"]


def _bucket(col):
    # first 4 hex chars of md5 -> int -> mod 100: uniform, engine-agnostic
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast(
        "long"
    ) % 100


def sample_stratified_hash(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    rate = (
        F.when(F.col("source").isin(_BOOSTED_SOURCES), F.lit(_RATE_BOOSTED))
        .otherwise(F.lit(_RATE_DEFAULT))
    )
    return (
        d.select("source", (_bucket(F.col("doc_id")) < rate).alias("keep"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_sampled"),
        )
    )


def _sample_sql() -> str:
    boosted = ", ".join(f"'{s}'" for s in _BOOSTED_SOURCES)
    return f"""
WITH b AS (
  SELECT source,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100
           AS bucket,
         CASE WHEN source IN ({boosted}) THEN {_RATE_BOOSTED}
              ELSE {_RATE_DEFAULT} END AS rate
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT)                                  AS n_total,
       CAST(sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM b
GROUP BY source
"""


# ---------------------------------------------------------------------------
# Chunk-level exact dedup: split each document into fixed-size token
# chunks (complete chunks only), hash each chunk, report chunks that
# appear more than once corpus-wide. This is the paragraph-dedup shape
# used to strip boilerplate from web-scale training corpora.
_CHUNK = 20


def dedup_chunks(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = (F.size(toks) / _CHUNK).cast("int")  # complete chunks only
    # sequence(0, -1) would yield a DESCENDING [0, -1] — guard n_chunks=0
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunk_hashes = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(toks, i * _CHUNK + 1, _CHUNK))
        ),
    )
    return (
        d.select("doc_id", F.explode(chunk_hashes).alias("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .where(F.col("n_occurrences") > 1)
    )


CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), c AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, CAST(floor(len(toks) / {_CHUNK}) AS INT)),
           i -> md5(array_to_string(
                  list_slice(toks, i * {_CHUNK} + 1, i * {_CHUNK} + {_CHUNK}),
                  ' '))
         )) AS chunk_hash
  FROM t
)
SELECT chunk_hash,
       CAST(count(*) AS BIGINT)              AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM c
GROUP BY chunk_hash
HAVING count(*) > 1
"""


QUERIES = {
    "pii_scrub_customers": QuerySpec(pii_scrub_customers, PII_SQL),
    "sample_stratified_hash": QuerySpec(sample_stratified_hash, _sample_sql()),
    "dedup_chunks": QuerySpec(dedup_chunks, CHUNK_SQL),
}
