"""Corpus-wide line-level dedup — the CCNet/C4 boilerplate-removal pass.

Per-document line filters (``text_c4_filters``) can't catch boilerplate
that is only recognisable ACROSS documents: navigation chrome, cookie
banners, subscribe footers repeated on thousands of pages. The standard
pipeline pass (CCNet, C4, RefinedWeb all do a variant) is:

1. explode documents into (doc_id, pos, line),
2. count each trimmed line's DOCUMENT frequency corpus-wide,
3. drop lines appearing in >= K distinct documents,
4. reassemble each document from its surviving lines in order.

Scale shape: the document-frequency aggregate is the one heavy shuffle
(distinct (line, doc) then count, both map-side combined); the
boilerplate set it yields is the FREQUENT tail only — orders of
magnitude smaller than the corpus — so the filtering join broadcasts at
real scale. Reassembly shuffles once on doc_id; per-doc state is that
document's own lines (bounded by document size, not corpus size).

The evaluation corpus plants boilerplate deterministically (variant
docs wrapped in a subscribe header + copyright footer, ids offset as in
``dedup_q``), so the operator has known positives and the DuckDB oracle
checks the full pipeline value-for-value, including exact reassembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_VARIANT_OFFSET = 100000
_LD_THRESHOLD = 3  # drop lines present in >= 3 distinct docs
_BOILER_TOP = "Subscribe to our newsletter for updates."
_BOILER_BOT = "(c) Example Corp. All rights reserved."


def corpus_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + _VARIANT_OFFSET).alias("doc_id"),
            F.concat(
                F.lit(_BOILER_TOP + "\n"), F.col("text"), F.lit("\n" + _BOILER_BOT)
            ).alias("text"),
        )
    )
    lines = corpus.select(
        "doc_id", F.posexplode(F.split("text", "\n", -1)).alias("pos", "line")
    )
    # document frequency per trimmed line (two map-side-combined aggs)
    docfreq = (
        lines.select(F.trim("line").alias("key"), "doc_id")
        .distinct()
        .groupBy("key")
        .agg(F.count("*").alias("docfreq"))
    )
    # the frequent tail only — broadcastable at scale
    boiler = docfreq.where(F.col("docfreq") >= _LD_THRESHOLD).select(
        F.col("key").alias("bkey")
    )
    flagged = lines.join(
        F.broadcast(boiler), F.trim(F.col("line")) == F.col("bkey"), "left"
    ).select("doc_id", "pos", "line", F.col("bkey").isNotNull().alias("is_boiler"))
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_lines"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).cast("int").alias("n_dropped"),
        F.array_join(
            F.transform(
                # collect_list skips the nulls the when() leaves for
                # boilerplate lines; struct sort restores document order
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("is_boiler"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("cleaned_text"),
    )


LINE_DEDUP_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_VARIANT_OFFSET},
         '{_BOILER_TOP}' || chr(10) || text || chr(10) || '{_BOILER_BOT}'
  FROM documents
),
lines AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos,
         unnest(string_split(text, chr(10))) AS line
  FROM corpus
),
docfreq AS (
  SELECT trim(line) AS key, count(*) AS docfreq
  FROM (SELECT DISTINCT trim(line) AS line, doc_id FROM lines) x
  GROUP BY trim(line)
),
flagged AS (
  SELECT l.doc_id, l.pos, l.line,
         coalesce(d.docfreq >= {_LD_THRESHOLD}, FALSE) AS is_boiler
  FROM lines l LEFT JOIN docfreq d ON trim(l.line) = d.key
)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_lines,
       CAST(count(*) FILTER (WHERE is_boiler) AS INT) AS n_dropped,
       coalesce(array_to_string(list(line ORDER BY pos) FILTER (WHERE NOT is_boiler),
                                chr(10)), '') AS cleaned_text
FROM flagged GROUP BY doc_id
"""


QUERIES = {
    "corpus_line_dedup": QuerySpec(corpus_line_dedup, LINE_DEDUP_SQL),
}


# ---------------------------------------------------------------------------
# Sequence packing: assign documents to fixed-budget training sequences
# (the "pack to 2048 tokens" step before LLM training). True first-fit
# bin packing is inherently sequential; the scalable standard is
# CUMULATIVE-SUM CHUNKING: order docs deterministically (tokens desc,
# doc_id), take a running token total, and cut a new bin every time the
# total crosses a budget multiple — each bin overfills by at most one
# document, with zero coordination.
#
# Scale shape: SHARD-PREFIXED packing. Packing has no cross-shard
# semantics to preserve — any deterministic partition of the corpus
# packs independently — so the running sum is a window PARTITIONED BY
# shard (doc_id % S), and bin ids are shard-prefixed. Per-task state is
# |corpus|/S, chosen by S ~ cluster parallelism at real scale; a global
# partition-less window (the previous formulation) would funnel every
# document through one reducer's sort. S is a fixed literal here so the
# DuckDB oracle reproduces the exact bin ids.
_PACK_BUDGET = 2048
_PACK_SHARDS = 16
_PACK_SHARD_STRIDE = 1_000_000  # bin_id = shard * stride + local_bin


def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf, "documents").select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy(F.col("n_tokens").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # integer division (`div` / `//`), NOT cast(double->long): DuckDB's
    # double->BIGINT cast rounds to nearest while Spark's truncates
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    binned = d.select(
        "doc_id",
        "n_tokens",
        "shard",
        cum_before.alias("cum_before"),
    ).select(
        "doc_id",
        "n_tokens",
        (
            F.col("shard") * _PACK_SHARD_STRIDE
            + F.expr(f"cum_before div {_PACK_BUDGET}")
        ).alias("bin_id"),
    )
    return binned.groupBy("bin_id").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max("n_tokens").alias("max_doc_tokens"),
        F.round(F.sum("n_tokens") / float(_PACK_BUDGET), 4).alias("fill_ratio"),
    )


PACK_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         doc_id % {_PACK_SHARDS} AS shard
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         shard * {_PACK_SHARD_STRIDE}
         + CAST((sum(n_tokens) OVER (PARTITION BY shard
                                     ORDER BY n_tokens DESC, doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin_id
  FROM d
)
SELECT bin_id,
       CAST(count(*) AS INT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_doc_tokens,
       round(sum(n_tokens) / {float(_PACK_BUDGET)}, 4) AS fill_ratio
FROM c GROUP BY bin_id
"""

QUERIES["pack_sequences"] = QuerySpec(pack_sequences, PACK_SQL)


# ---------------------------------------------------------------------------
# Leakage-free train/validation/test split: the split key is the NEAR-DUP
# CLUSTER, not the document — otherwise one member of a near-duplicate
# pair lands in train and its twin in test, and eval is contaminated
# (the standard eval-leakage failure in LLM data pipelines). Hash-bucket
# the cluster id (deterministic, coordination-free, engine-agnostic)
# 80/10/10, and report a leaked_clusters counter the query itself proves
# is zero (count of clusters spanning >1 split).
def split_no_leakage(spark: SparkSession, sf: str) -> DataFrame:
    from .cluster_q import dedup_cluster_assign

    clusters = dedup_cluster_assign(spark, sf).select("doc_id", "cluster_id")
    bucket = (
        F.conv(F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    tagged = clusters.withColumn(
        "split",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("validation"))
        .otherwise(F.lit("test")),
    )
    leaks = (
        tagged.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .agg(
            F.count(F.when(F.col("n_splits") > 1, 1)).cast("long").alias(
                "leaked_clusters"
            )
        )
    )
    per_split = tagged.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("cluster_id").cast("long").alias("n_clusters"),
    )
    return per_split.crossJoin(leaks)


SPLIT_SQL = f"""
WITH RECURSIVE corpus AS ({{corpus}}),
pairs AS (
  SELECT doc_a, doc_b FROM ({{mh}}) mh_pairs
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
tagged AS (
  SELECT doc_id, cluster_id,
         CASE WHEN CAST('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 4) AS BIGINT)
                   % 100 < 80 THEN 'train'
              WHEN CAST('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 4) AS BIGINT)
                   % 100 < 90 THEN 'validation'
              ELSE 'test' END AS split
  FROM comp
),
leaks AS (
  SELECT CAST(count(*) FILTER (WHERE n_splits > 1) AS BIGINT) AS leaked_clusters
  FROM (SELECT cluster_id, count(DISTINCT split) AS n_splits FROM tagged GROUP BY 1)
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       leaked_clusters
FROM tagged CROSS JOIN leaks
GROUP BY split, leaked_clusters
"""

def _finalize_split_sql():
    from .dedup_q import _NEAR_DUP_CORPUS_SQL, _minhash_sql

    return SPLIT_SQL.format(corpus=_NEAR_DUP_CORPUS_SQL, mh=_minhash_sql())


QUERIES["split_no_leakage"] = QuerySpec(split_no_leakage, _finalize_split_sql())


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: what fraction of all token OCCURRENCES the
# top-k most frequent types cover (k = 5 / 10 / 25) — the number a
# tokenizer/vocab-size decision actually needs (ks sized to the
# synthetic corpus's ~31-type vocab; real corpora use 1e3..1e5).
#
# Scale shape: TWO-PHASE top-k. Phase 1: ``orderBy().limit(max_k)``
# lowers to TakeOrderedAndProject — per-partition max_k-row heaps over
# the |vocab| aggregate, merged as max_k x N rows on the driver — never
# a partition-less window over the whole vocabulary (the previous
# formulation's single-reducer rank+cumsum). Phase 2: exact rank and
# cumulative sum over the surviving max_k rows via a broadcast
# self-join (rank(t) = #{rows ordered before t}) — max_k^2 = 625
# comparisons, no window at all. Ranks <= max_k are exact because any
# global top-k row is inside the global top-max_k set.
_COVERAGE_KS = [5, 10, 25]


def vocab_coverage_topk(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    top = vocab.orderBy(F.col("c").desc(), "tok").limit(max(_COVERAGE_KS))
    a, b = top.alias("a"), top.alias("b")
    before_or_self = (F.col("b.c") > F.col("a.c")) | (
        (F.col("b.c") == F.col("a.c")) & (F.col("b.tok") <= F.col("a.tok"))
    )
    ranked = (
        a.join(F.broadcast(b), before_or_self)
        .groupBy("a.tok", "a.c")
        .agg(
            F.count("*").cast("int").alias("rank"),
            F.sum("b.c").alias("cum"),
        )
    )
    total = toks.agg(F.count("*").alias("total"))
    return (
        ranked.where(F.col("rank").isin(_COVERAGE_KS))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("rank").alias("k"),
            F.col("cum").alias("n_occurrences_covered"),
            "total",
            F.round(F.col("cum") / F.col("total"), 4).alias("coverage"),
        )
    )


VOCAB_COVERAGE_SQL = f"""
WITH t AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok FROM documents
),
v AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
r AS (
  SELECT tok, c,
         row_number() OVER (ORDER BY c DESC, tok) AS rank,
         sum(c) OVER (ORDER BY c DESC, tok
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM v
),
n AS (SELECT count(*) AS total FROM t)
SELECT CAST(r.rank AS INT) AS k,
       CAST(r.cum AS BIGINT) AS n_occurrences_covered,
       CAST(n.total AS BIGINT) AS total,
       round(r.cum / CAST(n.total AS DOUBLE), 4) AS coverage
FROM r CROSS JOIN n
WHERE r.rank IN ({", ".join(map(str, _COVERAGE_KS))})
"""

QUERIES["vocab_coverage_topk"] = QuerySpec(vocab_coverage_topk, VOCAB_COVERAGE_SQL)


# ---------------------------------------------------------------------------
# Overlapping-window document chunking — the RAG / embedding-prep step:
# split each document into fixed-size token windows with a stride
# (here 64-token windows, stride 48 = 16-token overlap), so retrieval
# embeddings never cut a thought at a hard boundary. Pure per-row array
# math (explode of a per-doc chunk index sequence + slice): zero
# shuffle, whole-stage codegen, trivially parallel at any corpus size.
# The last window covers the tail (k_max = ceil((n-W)/S)), matching the
# LangChain/LlamaIndex-style splitter contract.
_CHUNK_W = 64
_CHUNK_S = 48


def chunk_overlap_windows(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "text")
    toks = F.split(F.trim("text"), r"\s+")
    n = F.size(toks)
    k_max = F.when(n <= _CHUNK_W, F.lit(0).cast("long")).otherwise(
        F.ceil((n - _CHUNK_W) / F.lit(float(_CHUNK_S))).cast("long")
    )
    chunks = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), k_max)).alias("chunk_idx"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.slice(
            F.col("toks"), (F.col("chunk_idx") * _CHUNK_S + 1).cast("int"), _CHUNK_W
        ).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").cast("long").alias("n_tokens"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_hash"),
    )


CHUNK_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
k AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) <= {_CHUNK_W} THEN 0
              ELSE CAST(ceil((len(toks) - {_CHUNK_W}) / {float(_CHUNK_S)}) AS BIGINT)
         END AS k_max
  FROM d
),
c AS (
  SELECT doc_id, unnest(range(0, k_max + 1)) AS chunk_idx, toks FROM k
)
SELECT doc_id, chunk_idx,
       CAST(len(list_slice(toks, chunk_idx * {_CHUNK_S} + 1,
                           chunk_idx * {_CHUNK_S} + {_CHUNK_W})) AS BIGINT) AS n_tokens,
       md5(array_to_string(list_slice(toks, chunk_idx * {_CHUNK_S} + 1,
                                      chunk_idx * {_CHUNK_S} + {_CHUNK_W}), ' ')) AS chunk_hash
FROM c
"""

QUERIES["chunk_overlap_windows"] = QuerySpec(chunk_overlap_windows, CHUNK_SQL)
