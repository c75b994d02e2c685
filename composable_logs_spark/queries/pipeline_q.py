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
# Full PII scrub over the corpus — the production form of pii_scrub_
# customers' single digit-run rule: emails, phone shapes, SSN-like
# patterns, and long digit runs, each masked with a typed token and
# counted per category. Categories apply SEQUENTIALLY (email -> phone
# -> SSN -> digit run), each counted on the text the previous stages
# already masked: sequencing makes the per-category counts
# unambiguous (an email's digits can't also count as an account
# number) and is engine-order-independent, unlike one big alternation
# whose per-branch attribution depends on the regex engine's
# alternation semantics. All four patterns sit in the Java∩RE2 regex
# subset (plain classes + counted repetition, no lookaround) so Spark
# and DuckDB extract identical matches.
#
# The corpus is synthetic, so docs with doc_id < _PII_PLANT get a
# deterministic PII suffix planted (same expression in both engines) —
# the gate hash then proves the masking logic on real positives at
# every SF, not just the all-zero path.
#
# Scale shape: a narrow per-row map — zero shuffle, streams through
# the scan (held to it by tests/test_plan_audit.py's no-Exchange
# audit). The scrubbed text itself is reported as an md5 so the
# operator's full output is hash-proven without shipping corpus bytes.
_PII_PLANT = 10
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\(?[0-9]{3}\\)?[ -][0-9]{3}[ -][0-9]{4}"
_PII_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
_PII_STAGES = [
    ("n_emails", _PII_EMAIL, "[EMAIL]"),
    ("n_phones", _PII_PHONE, "[PHONE]"),
    ("n_ssns", _PII_SSN, "[SSN]"),
    ("n_ids", _ID_RUN, _MASK),
]


def scrub_stages(text_col):
    """(counts dict, scrubbed column): sequential mask + count exprs,
    shared by the query and the planted-PII test."""
    counts = {}
    cur = text_col
    for name, pat, mask in _PII_STAGES:
        counts[name] = F.regexp_count(cur, F.lit(pat)).cast("int")
        cur = F.regexp_replace(cur, pat, mask)
    return counts, cur


def pii_scrub_documents(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    planted = F.when(
        F.col("doc_id") < _PII_PLANT,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call 555-123-4567 ssn 123-45-6789 acct 900123456"),
        ),
    ).otherwise(F.col("text"))
    counts, scrubbed = scrub_stages(planted)
    return d.select(
        "doc_id",
        *[counts[n].alias(n) for n, _, _ in _PII_STAGES],
        F.md5(scrubbed).alias("scrub_md5"),
    )


def _pii_docs_sql() -> str:
    stages = []
    cur = "planted"
    for name, pat, mask in _PII_STAGES:
        stages.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS INT) AS {name},"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{mask}', 'g')"
    count_sql = "\n       ".join(stages)
    return f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id < {_PII_PLANT}
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com call 555-123-4567 ssn 123-45-6789 acct 900123456'
              ELSE text END AS planted
  FROM documents
)
SELECT doc_id,
       {count_sql}
       md5({cur}) AS scrub_md5
FROM p
"""
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


# ---------------------------------------------------------------------------
# Benchmark decontamination (the GPT-3/Pile-style op): flag training
# documents that share any 8-gram with a held-out benchmark set, so they
# can be dropped before training. The benchmark here is the documents
# with doc_id < _BENCH_DOCS (a stand-in for e.g. an eval set's prompts).
#
# Scale shape: the benchmark n-gram set is SMALL (benchmarks are KBs-MBs,
# the corpus is TBs) — hash benchmark 8-grams to longs, build it once,
# and BROADCAST it into an equi-join against the corpus's exploded
# 8-gram hashes; per-doc hit counts come from a hash aggregate. The
# corpus side streams through one scan + explode; no corpus self-join,
# no shuffle of corpus text.
_NGRAM_N = 8
_BENCH_DOCS = 20


def _ngram_hashes(text_col):
    """Hashed word 8-grams (distinct 31-bit md5 prefixes, longs)."""
    toks = F.split(F.trim(text_col), r"\s+")
    n = F.greatest(F.size(toks) - (_NGRAM_N - 1), F.lit(1))
    slices = [F.slice(toks, i + 1, n) for i in range(_NGRAM_N)]
    empty = F.lit("")
    joined = slices[0]
    for s in slices[1:]:
        joined = F.zip_with(
            joined, s, lambda a, b: F.concat(F.coalesce(a, empty), F.lit(" "), F.coalesce(b, empty))
        )
    return F.array_distinct(
        F.transform(
            joined,
            lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long") % 2147483647,
        )
    )


def decontaminate_against_benchmark(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "text")
    bench = d.where(F.col("doc_id") < _BENCH_DOCS)
    # evaluation corpus: the real corpus plus PLANTED contamination — each
    # benchmark text with its first 3 words dropped (ids offset +100000),
    # the partial-overlap case the op exists to catch
    toks = F.split(F.trim(F.col("text")), r"\s+")
    planted = bench.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.slice(toks, 4, F.greatest(F.size(toks) - 3, F.lit(1))), " ").alias(
            "text"
        ),
    )
    corpus = d.where(F.col("doc_id") >= _BENCH_DOCS).unionByName(planted)
    bench_grams = (
        bench.select(F.explode(_ngram_hashes(F.col("text"))).alias("g")).distinct()
    )
    corpus_grams = corpus.select(
        "doc_id", F.explode(_ngram_hashes(F.col("text"))).alias("g")
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
        .select("doc_id", F.col("n_hits").cast("long").alias("n_hits"))
    )


_TOKS_SQL = "string_split_regex(trim(text), '\\s+')"
_GRAM_CONCAT_SQL = " || ' ' || ".join(
    f"coalesce({_TOKS_SQL}[i+{k}], '')" for k in range(_NGRAM_N)
)

_NGRAM_SQL_EXPR = f"""
  list_distinct(list_transform(
    list_transform(
      range(1, greatest(len({_TOKS_SQL}) - {_NGRAM_N - 1}, 1) + 1),
      i -> {_GRAM_CONCAT_SQL}
    ),
    g -> CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) % 2147483647
  ))
"""

DECONTAM_SQL = f"""
WITH d AS (SELECT doc_id, text FROM documents),
corpus_docs AS (
  SELECT doc_id, text FROM d WHERE doc_id >= {_BENCH_DOCS}
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), 4,
                         3 + greatest(len(string_split_regex(trim(text), '\\s+')) - 3, 1)),
                         ' ')
  FROM d WHERE doc_id < {_BENCH_DOCS}
),
bench AS (
  SELECT DISTINCT unnest({_NGRAM_SQL_EXPR}) AS g FROM d WHERE doc_id < {_BENCH_DOCS}
),
corpus AS (
  SELECT doc_id, unnest({_NGRAM_SQL_EXPR}) AS g FROM corpus_docs
)
SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM corpus c JOIN bench b ON c.g = b.g
GROUP BY c.doc_id
"""


# ---------------------------------------------------------------------------
# Quality-weighted deterministic sampling: acceptance probability scales
# with document quality (here: length capped at 1000 chars -> p in
# [0, 1]), decided by the same md5-bucket trick as the stratified
# sampler. All-integer comparison (bucket in [0, 10000) vs
# least(n_chars, 1000) * 10), so the decision is exact, reproducible,
# and identical in both engines — and, like every hash-based sampler
# here, a zero-shuffle narrow map over the corpus.
def sample_quality_weighted(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 10000
    )
    threshold = F.least(F.col("n_chars"), F.lit(1000)) * 10
    return (
        d.select(
            "source",
            (bucket < threshold).alias("keep"),
            threshold.alias("thr"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.round(F.sum(F.col("thr")) / (F.count("*") * 10000.0), 4).alias(
                "expected_rate"
            ),
        )
    )


WEIGHTED_SAMPLE_SQL = """
WITH b AS (
  SELECT source,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10000
           AS bucket,
         least(n_chars, 1000) * 10 AS thr
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT)                                        AS n_total,
       CAST(sum(CASE WHEN bucket < thr THEN 1 ELSE 0 END) AS BIGINT)   AS n_kept,
       round(sum(thr) / (count(*) * 10000.0), 4)                       AS expected_rate
FROM b
GROUP BY source
"""


# ---------------------------------------------------------------------------
# The end-to-end clean-corpus pipeline, composed from the individual
# operators: near-dup dedup (minhash-LSH pairs -> connected components ->
# keep the longest doc per cluster) THEN quality filtering (C4 line
# filters + Gopher repetition + stopword/diversity quality) on the
# keepers. Order matters and mirrors production recipes: dedup first so
# a high-quality doc is not dropped in favour of a filtered-out twin.
#
# Scale shape is the union of its parts (each documented at its
# definition): LSH equi-joins + sparse-edge components + one arg-max
# hash-agg + three narrow-map filters joined on doc_id. Nothing here
# adds a new shuffle class.
def neardup_keepers(d: DataFrame) -> DataFrame:
    """Document-level near-dup dedup over any (doc_id, text, n_chars)
    frame: minhash-LSH pairs -> connected components -> keep the
    longest doc per cluster (doc_id tie-break). Shared by the clean-
    corpus pipeline and the CCNet recipe (ccnet_q) so the stage cannot
    drift between compositions."""
    from ..operators.components import connected_components
    from .dedup_q import minhash_pairs

    pairs = minhash_pairs(d.select("doc_id", "text")).select("doc_a", "doc_b")
    comp = connected_components(
        d.select(F.col("doc_id").alias("id")),
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    ).select(F.col("id").alias("doc_id"), F.col("component").alias("cluster_id"))
    labeled = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
            ).alias("best")
        )
        .select((-F.col("best.neg_id")).alias("doc_id"))
    )


def pipeline_clean_corpus(spark: SparkSession, sf: str) -> DataFrame:
    from .text_ops import text_c4_filters, text_quality_scores, text_repetition

    d = load(spark, sf, "documents")
    keepers = neardup_keepers(d)
    # of the C4 rules, only the boilerplate markers discriminate on this
    # corpus (single-line synthetic text: the line-level terminal-punct /
    # min-words rules are vacuously false for every doc, real or junk);
    # the full line-level keep_doc stays available via text_c4_filters.
    #
    # Each filter is applied INSIDE its own frame and only doc_id crosses
    # the (semi-)join: carrying the boolean across the join and filtering
    # above it would let predicate pushdown re-inline each filter's
    # array expressions into the join stage — every predicate evaluated
    # once per downstream reference instead of once per doc.
    c4_keep = text_c4_filters(spark, sf).where(~F.col("has_boilerplate")).select("doc_id")
    rep_keep = text_repetition(spark, sf).where("passes_repetition").select("doc_id")
    qual_keep = text_quality_scores(spark, sf).where("passes_quality").select("doc_id")
    return (
        d.join(keepers, "doc_id")
        .join(c4_keep, "doc_id", "semi")
        .join(rep_keep, "doc_id", "semi")
        .join(qual_keep, "doc_id", "semi")
        .select("doc_id", "lang", "source", F.col("n_chars").cast("int").alias("n_chars"))
    )


def _clean_corpus_sql() -> str:
    from .dedup_q import _minhash_sql
    from .text_ops import C4_SQL, QUALITY_SQL, REPETITION_SQL

    return f"""
WITH RECURSIVE corpus AS (SELECT doc_id, text FROM documents),
pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_sql()}) mh_pairs
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, anc) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.dst AS id, r.anc FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (
  SELECT id AS doc_id, min(anc) AS cluster_id FROM reach GROUP BY id
),
lab AS (
  SELECT c.doc_id, c.cluster_id, d.n_chars
  FROM comp c JOIN documents d USING (doc_id)
),
keep AS (
  SELECT doc_id
  FROM (SELECT doc_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM lab) ranked
  WHERE rn = 1
),
c4 AS (SELECT doc_id, has_boilerplate FROM ({C4_SQL}) x),
rep AS (SELECT doc_id, passes_repetition FROM ({REPETITION_SQL}) y),
qual AS (SELECT doc_id, passes_quality FROM ({QUALITY_SQL}) z)
SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS INT) AS n_chars
FROM documents d
JOIN keep USING (doc_id)
JOIN c4   USING (doc_id)
JOIN rep  USING (doc_id)
JOIN qual USING (doc_id)
WHERE NOT c4.has_boilerplate AND rep.passes_repetition AND qual.passes_quality
"""


# ---------------------------------------------------------------------------
# Declarative data-quality gate (deequ/dbt-test family): N rules compile
# into ONE aggregation pass (see operators/constraints.py). The result
# is data, so quality gates compose with the pipeline.
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def dq_check_customers(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.constraints import (
        accepted_values,
        check,
        in_range,
        matches,
        not_null,
        unique,
    )

    c = load(spark, sf, "customer")
    return check(
        c,
        [
            unique("c_custkey"),
            not_null("c_name"),
            accepted_values("c_mktsegment", _SEGMENTS),
            in_range("c_acctbal", -1000.0, 10000.0),
            matches("c_name", "^Customer#[0-9]{9}$"),
        ],
    )


def _dq_sql() -> str:
    segs = ", ".join(f"'{s}'" for s in _SEGMENTS)
    return f"""
WITH a AS (
  SELECT count(*) AS n,
         count(*) - count(DISTINCT c_custkey) AS v0,
         sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS v1,
         sum(CASE WHEN c_mktsegment NOT IN ({segs}) OR c_mktsegment IS NULL
                  THEN 1 ELSE 0 END) AS v2,
         sum(CASE WHEN c_acctbal NOT BETWEEN -1000.0 AND 10000.0
                    OR c_acctbal IS NULL THEN 1 ELSE 0 END) AS v3,
         sum(CASE WHEN NOT regexp_matches(c_name, '^Customer#[0-9]{{9}}$')
                    OR c_name IS NULL THEN 1 ELSE 0 END) AS v4
  FROM customer
)
SELECT rule, CAST(violations AS BIGINT) AS violations,
       CAST(n AS BIGINT) AS n_rows, violations = 0 AS passed
FROM (
  SELECT 'unique(c_custkey)' AS rule, v0 AS violations, n FROM a
  UNION ALL SELECT 'not_null(c_name)', v1, n FROM a
  UNION ALL SELECT 'accepted_values(c_mktsegment)', v2, n FROM a
  UNION ALL SELECT 'range(c_acctbal)', v3, n FROM a
  UNION ALL SELECT 'matches(c_name)', v4, n FROM a
) u
"""


QUERIES = {
    "pii_scrub_customers": QuerySpec(pii_scrub_customers, PII_SQL),
    "pii_scrub_documents": QuerySpec(pii_scrub_documents, _pii_docs_sql()),
    "dq_check_customers": QuerySpec(dq_check_customers, _dq_sql()),
    "sample_quality_weighted": QuerySpec(sample_quality_weighted, WEIGHTED_SAMPLE_SQL),
    "pipeline_clean_corpus": QuerySpec(pipeline_clean_corpus, _clean_corpus_sql()),
    "sample_stratified_hash": QuerySpec(sample_stratified_hash, _sample_sql()),
    "dedup_chunks": QuerySpec(dedup_chunks, CHUNK_SQL),
    "decontaminate_against_benchmark": QuerySpec(
        decontaminate_against_benchmark, DECONTAM_SQL
    ),
}
