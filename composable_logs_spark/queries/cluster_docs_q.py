"""Unsupervised domain discovery: k-means document clustering over
hashed bag-of-words vectors — the cluster-based corpus-organization
step mixture tuning builds on (DoReMi-style domain reweighting and
cluster-balanced sampling both start from exactly this artifact), and
a text-feature consumer for the shared deterministic Lloyd trainer
that ``similarity_q``/``semdedup_q`` run on embeddings.

Features: the hashing trick — term -> md5 -> bucket in [0, 64), doc
vector = integer term counts per bucket, cast to double. Every vector
component is an exact small integer, squared distances are
integer-valued doubles (< 2^53, exactly representable), so distance
sums are EXACT regardless of summation order — this path is even
stricter cross-engine than the embedding queries (which rely on the
6dp rounding discipline).

The 64 buckets equal the Lloyd chain's fixed vector width, so the
whole trained pipeline (assign/recompute/unrolled-CTE oracle) is
reused verbatim with only the corpus CTE swapped — the gate hash
therefore proves the text-feature construction AND the shared trainer
once more, over a different data distribution.

100 TB design: feature build is one explode + two hash aggs (map-side
combined); k-means is broadcast-centroid argmin passes; the report is
one groupBy(cell). B (buckets) and K (cells) both grow with corpus
size in production; nothing here is pairwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load
from .similarity_q import _KM_K, _km_assign, _km_cte_chain, _train_kmeans_on

_TC_B = 64  # hashed-feature buckets == the Lloyd chain's vector width


def _doc_vectors(docs: DataFrame) -> DataFrame:
    terms = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
    )
    counts = (
        terms.select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long")
                % _TC_B
            )
            .cast("int")
            .alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "cnt"))
            ).alias("m")
        )
        .select(
            F.col("doc_id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {_TC_B - 1}),"
                " j -> cast(coalesce(element_at(m, j), 0) as double))"
            ).alias("vec"),
        )
    )


def assign_doc_clusters(d: DataFrame) -> DataFrame:
    """(doc_id, cell): the trained cluster assignment — shared by the
    cluster report and the DoReMi reweighting composition (doremi_q)."""
    # r13 (guide §3.3/§5): materialize the hashed-BoW vectors — every
    # Lloyd pass plus the final assignment re-derived them from raw
    # text (explode + md5 + conv per term) otherwise. ~N x B doubles,
    # computed per invocation.
    vecs = _doc_vectors(d).localCheckpoint(eager=True)
    cents = _train_kmeans_on(vecs)
    return _km_assign(vecs, cents).select(F.col("vec_id").alias("doc_id"), "cell")


def cluster_docs_hashed_tf(spark: SparkSession, sf: str) -> DataFrame:
    """Per-cluster report: size, language/source composition (dominant
    source with lexicographic tie-break), and a digest of exactly
    WHICH docs each cluster holds."""
    d = load(spark, sf, "documents")
    return _cluster_report(assign_doc_clusters(d), d)


_MB_MOD = 8  # deterministic train-sample stride: ~1/8 of the corpus


def cluster_docs_minibatch(spark: SparkSession, sf: str) -> DataFrame:
    """Mini-batch variant of ``cluster_docs_hashed_tf`` — the SUB-LINEAR
    training path the exact query lacks (r12 verdict: fixed-k full-pass
    Lloyd was the one headline-adjacent operator with no sublinear
    option; SCALE.md's 128x table shows it exactly linear).

    Every Lloyd round assigns only a deterministic hash-sample of the
    corpus (md5(doc_id) stride — engine-agnostic, no RNG — plus the
    k init seeds so initialisation matches the exact trainer's
    convention); only the FINAL assignment pass touches every document,
    and that pass is one broadcast-centroid argmin scan. Training cost
    drops from (iters+1) full passes to iters/|sample| + 1: at the
    production scale knob the sample is ~sqrt(N) rows (the fraction
    shrinks as the corpus grows — a FIXED fraction is pinned here only
    so the oracle is deterministic across SFs), making training
    sub-linear while the unavoidable output pass stays single-scan.

    Same report shape as the exact query, so the two are directly
    comparable; centroids differ (trained on the sample), so cluster
    memberships legitimately differ — the oracle replicates the
    sampled trainer exactly."""
    d = load(spark, sf, "documents")
    # r13: materialized for the same reason as assign_doc_clusters
    vecs = _doc_vectors(d).localCheckpoint(eager=True)
    sample = vecs.where(
        (
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10
            ).cast("long")
            % _MB_MOD
            == 0
        )
        | (F.col("vec_id") < _KM_K)
    )
    cents = _train_kmeans_on(sample)
    assigned = _km_assign(vecs, cents).select(
        F.col("vec_id").alias("doc_id"), "cell"
    )
    return _cluster_report(assigned, d)


def _cluster_report(assigned: DataFrame, d: DataFrame) -> DataFrame:
    joined = assigned.join(d.select("doc_id", "lang", "source"), "doc_id")
    src = (
        joined.groupBy("cell", "source")
        .agg(F.count("*").alias("n"))
        .groupBy("cell")
        .agg(
            F.max(F.struct(F.col("n"), F.col("source").alias("s")))["s"].alias(
                "top_source"
            )
        )
    )
    return (
        joined.groupBy("cell")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("n_en"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("member_digest"),
        )
        .join(src, "cell")
        .select("cell", "n_docs", "n_en", "top_source", "member_digest")
        .orderBy("cell")
    )


# hashed-BoW feature CTEs, shared with the DoReMi reweighting oracle
# (doremi_q) so the two compositions cannot drift
FEATURE_CTES = [
    """t AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
)""",
    f"""cnts AS (
  SELECT doc_id,
         CAST(CAST('0x' || substring(md5(term), 1, 15) AS BIGINT)
              % {_TC_B} AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM t GROUP BY doc_id, bucket
)""",
    """dpairs AS (
  SELECT doc_id, list({'b': bucket, 'c': cnt}) AS ps FROM cnts GROUP BY doc_id
)""",
    f"""corpus0 AS (
  SELECT doc_id AS vec_id,
         list_transform(range(0, {_TC_B}),
           j -> CAST(coalesce(list_sum(list_transform(
                  list_filter(ps, p -> p.b = j), p -> p.c)), 0) AS DOUBLE))
           AS vec
  FROM dpairs
)""",
]


_REPORT_SQL_TAIL = """,
assigned AS (
  SELECT f.vec_id AS doc_id, f.cell, d.lang, d.source
  FROM finaln f JOIN documents d ON d.doc_id = f.vec_id
),
src AS (
  -- Spark's max(struct(n, source)) = highest n, then lexicographically
  -- highest source; replicate with an explicit two-key ordering
  SELECT cell, source AS top_source FROM (
    SELECT cell, source,
           row_number() OVER (PARTITION BY cell
                              ORDER BY n DESC, source DESC) AS rn
    FROM (SELECT cell, source, count(*) AS n FROM assigned
          GROUP BY cell, source)
  ) WHERE rn = 1
)
SELECT a.cell,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN a.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_en,
       max(s.top_source) AS top_source,
       md5(array_to_string(
             list(CAST(a.doc_id AS VARCHAR) ORDER BY a.doc_id), ','))
         AS member_digest
FROM assigned a JOIN src s ON s.cell = a.cell
GROUP BY a.cell
ORDER BY a.cell
"""


def _cluster_docs_sql() -> str:
    km_ctes, _ = _km_cte_chain("SELECT vec_id, vec FROM corpus0")
    return "WITH " + ",\n".join(FEATURE_CTES + km_ctes) + _REPORT_SQL_TAIL


def _cluster_minibatch_sql() -> str:
    # train chain over the deterministic hash-sample; the FINAL
    # assignment pass covers the full corpus (final_assign_src)
    sample_sql = (
        "SELECT vec_id, vec FROM corpus0 WHERE"
        " CAST(CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)"
        f"        AS BIGINT) % {_MB_MOD} AS INT) = 0"
        f" OR vec_id < {_KM_K}"
    )
    km_ctes, _ = _km_cte_chain(
        sample_sql, final_assign_src="(SELECT vec_id, vec FROM corpus0)"
    )
    return "WITH " + ",\n".join(FEATURE_CTES + km_ctes) + _REPORT_SQL_TAIL


QUERIES = {
    "cluster_docs_hashed_tf": QuerySpec(
        cluster_docs_hashed_tf, _cluster_docs_sql()
    ),
    "cluster_docs_minibatch": QuerySpec(
        cluster_docs_minibatch, _cluster_minibatch_sql()
    ),
}
