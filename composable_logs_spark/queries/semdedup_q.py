"""SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") — the third canonical
LLM-corpus dedup modality next to exact substring (``substr_q``) and
lexical near-dup (``dedup_q`` MinHash/SimHash/Jaccard): duplicates in
EMBEDDING space, catching paraphrases and re-renderings no token-level
method sees.

The reference's dedup surface is span-id anti-joins
(opentelemetry_helpers.py:540-546) — this is north-star scope.

Algorithm, exactly the paper's shape:

1. k-means the embeddings into K cells (the shared deterministic
   unrolled-Lloyd trainer from ``similarity_q``; the paper uses
   K ~ sqrt(N) — 50k cells for LAION — so the within-cell pair stage
   is bounded by cell size exactly like IVF bounds ANN; never a
   corpus-wide pair join).
2. Within each cell, examples are ordered by similarity to the cell
   centroid ASCENDING (the paper found keeping LOW-centroid-similarity
   examples works best) with vec_id as tie-break.
3. An example is a semantic duplicate iff its cosine to ANY
   earlier-ordered example in the cell is >= tau — the paper's
   triangular-mask formulation (one pass over the within-cell pair
   matrix, no iteration/connected components), deterministic and
   SQL-expressible.
4. Keep = not dropped; report per cell with a digest of the kept ids
   so the oracle proves the exact SELECTION cross-engine.

Cross-engine exactness: centroid similarities at 6dp, pair cosines at
4dp (the rounding discipline every similarity_q query uses), ordering
keys unique per (csim, vec_id).

The raw synthetic embeddings are near-orthogonal (max pairwise cosine
~0.5), so — same device as ``dedup_q.dedup_embedding_cosine`` — the
corpus is augmented with a deterministic perturbed variant per vector
(first coordinate x 1.01, vec_id + offset): semantic duplicates exist
by construction and the query demonstrably prunes them.

100 TB design: cells bound the pair stage (K grows with N); the only
corpus-wide operations are the k-means passes (broadcast centroids,
map-side argmin) and one groupBy(cell). The pair join is an equi-join
on cell — no CartesianProduct (plan-audited like the rest of the
registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load
from .similarity_q import (
    _KM_CORPUS_SQL,
    _as_double,
    _dot,
    _km_assign,
    _km_cte_chain,
    _norm,
    _train_kmeans_on,
)

_TAU = 0.95
_VARIANT_OFFSET = 100000


def _augmented(base: DataFrame) -> DataFrame:
    # guard the id-space split: a base vec_id >= _VARIANT_OFFSET would
    # collide with a variant id, corrupting the pair logic and
    # kept_digest IDENTICALLY on both engines (the oracle replicates
    # the same arithmetic, so it could not catch it) — fail loudly
    # instead of deduping silently-wrong.
    variant = base.select(
        F.when(
            F.col("vec_id") < _VARIANT_OFFSET,
            F.col("vec_id") + _VARIANT_OFFSET,
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "semdedup: base vec_id >= variant offset "
                    f"{_VARIANT_OFFSET} — raise _VARIANT_OFFSET"
                )
            )
        )
        .alias("vec_id"),
        F.transform(
            F.col("vec"), lambda x, i: F.when(i == 0, x * 1.01).otherwise(x)
        ).alias("vec"),
    )
    return base.unionByName(variant)


def semdedup_frame(
    corpus: DataFrame, tau: float = _TAU, k: int | None = None
) -> DataFrame:
    """Core operator over any (vec_id, vec) frame: one row per vector
    with (vec_id, cell, csim, dropped).

    ``k`` is the cell count — the paper's scale lever (K ~ sqrt(N); 50k
    cells for LAION): the pair stage's candidate count is bounded by
    sum(cell_i^2), so doubling K roughly quarters the per-cell pair
    work while the only K-cost is the broadcast centroid table.
    Defaults to the shared trainer's _KM_K."""
    from .similarity_q import _KM_K

    cents = _train_kmeans_on(corpus, _KM_K if k is None else k)
    assigned = _km_assign(corpus, cents)
    cmeta = cents.withColumn("cnrm", _norm(F.col("cvec")))
    r = (
        assigned.join(F.broadcast(cmeta), "cell")
        .withColumn("nrm", _norm(F.col("vec")))
        .withColumn(
            "csim",
            F.round(
                _dot(F.col("vec"), F.col("cvec"))
                / (F.col("nrm") * F.col("cnrm")),
                6,
            ),
        )
        .select("vec_id", "cell", "vec", "nrm", "csim")
        # r13 (guide §3.3/§5): materialize — r is referenced three
        # times (both sides of the pair join + the final flag join) and
        # each reference re-ran the whole k-means train/assign chain
        .localCheckpoint(eager=True)
    )
    # r13 (guide §4.2): the within-cell pair stage previously ran as a
    # self-join on cell with an interpreted zip_with+aggregate cosine
    # per pair — sum(cell_i^2) x 64 dims of non-codegen lambda work.
    # One Arrow pass per cell now computes each vector's MAX cosine to
    # any earlier-ordered vector: rows sort by the same (csim, vec_id)
    # key ("earlier" is exactly lexicographic-less, keys unique), the
    # dot accumulates dimension-at-a-time in float64 (the identical
    # left-to-right IEEE fold as F.aggregate), and nrm is the SAME
    # Spark-computed column shipped into the group (never recomputed).
    # round is monotone non-decreasing, so round(max cos, 4) >= tau
    # <=> exists a pair with round(cos, 4) >= tau — and the 4dp HALF_UP
    # round stays in Spark. A vector with no earlier peers reports
    # -inf, which no threshold passes (the old join simply emitted no
    # pair). NaN propagates through np.max exactly as Spark's
    # NaN-is-largest comparison treated a NaN pair: dropped.
    def _max_earlier_cos(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"vec_id": [], "max_cos": []}).astype(
                {"vec_id": "int64", "max_cos": "float64"}
            )
        order = np.lexsort((pdf["vec_id"].values, pdf["csim"].values))
        v = np.array(pdf["vec"].tolist(), dtype=np.float64)[order]
        nrm = pdf["nrm"].values[order]
        ids = pdf["vec_id"].values[order]
        acc = np.zeros((n, n), dtype=np.float64)
        for d in range(v.shape[1]):
            col = v[:, d]
            acc += np.multiply.outer(col, col)
        cos = acc / np.multiply.outer(nrm, nrm)
        cos[np.triu_indices(n)] = -np.inf  # keep only earlier (j < i)
        return pd.DataFrame({"vec_id": ids[1:], "max_cos": cos.max(axis=1)[1:]})

    dropped = (
        r.select("vec_id", "cell", "csim", "nrm", "vec")
        .groupBy("cell")
        .applyInPandas(_max_earlier_cos, "vec_id long, max_cos double")
        .where(F.round(F.col("max_cos"), 4) >= tau)
        .select("vec_id")
        .withColumn("dropped", F.lit(True))
    )
    return (
        r.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            "csim",
            F.coalesce("dropped", F.lit(False)).alias("dropped"),
        )
    )


def dedup_semantic(spark: SparkSession, sf: str, k: int | None = None) -> DataFrame:
    """Per-cell SemDeDup report over the augmented embeddings corpus:
    how many vectors each cell holds, how many survive, and a digest
    of exactly WHICH ids survive."""
    base = load(spark, sf, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("vec")
    )
    flags = semdedup_frame(_augmented(base), k=k)
    return (
        flags.groupBy("cell")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.when(F.col("dropped"), 0).otherwise(1))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("dropped"), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(~F.col("dropped"), F.col("vec_id"))
                            )
                        ),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("kept_digest"),
        )
        .orderBy("cell")
    )


_AUG_CORPUS_SQL = f"""{_KM_CORPUS_SQL}
  UNION ALL
  SELECT vec_id + {_VARIANT_OFFSET},
         list_transform(CAST(embedding AS DOUBLE[]),
                        (x, i) -> CASE WHEN i = 1 THEN x * 1.01 ELSE x END)
  FROM embeddings"""


def _semdedup_sql(k: int | None = None) -> str:
    from .similarity_q import _KM_K

    ctes, last_cent = _km_cte_chain(_AUG_CORPUS_SQL, _KM_K if k is None else k)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
cmeta AS (
  SELECT cell, cvec, sqrt(list_sum(list_transform(cvec, x -> x * x))) AS cnrm
  FROM {last_cent}
),
r AS (
  SELECT f.vec_id, f.cell, f.vec, f.nrm,
         round(list_sum(list_transform(range(1, 65),
                 j -> f.vec[j] * c.cvec[j])) / (f.nrm * c.cnrm), 6) AS csim
  FROM finaln f JOIN cmeta c USING (cell)
),
drp AS (
  SELECT DISTINCT a.vec_id
  FROM r a JOIN r b ON a.cell = b.cell
   AND (b.csim < a.csim OR (b.csim = a.csim AND b.vec_id < a.vec_id))
  WHERE round(list_sum(list_transform(range(1, 65),
          j -> a.vec[j] * b.vec[j])) / (a.nrm * b.nrm), 4) >= {_TAU}
),
flags AS (
  SELECT r.vec_id, r.cell, (d.vec_id IS NOT NULL) AS dropped
  FROM r LEFT JOIN drp d ON r.vec_id = d.vec_id
)
SELECT cell,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN dropped THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       md5(array_to_string(
             list(CAST(vec_id AS VARCHAR) ORDER BY vec_id)
               FILTER (WHERE NOT dropped), ',')) AS kept_digest
FROM flags
GROUP BY cell
ORDER BY cell
"""
    )


# The K scale knob, exercised in the registry: same operator, doubled
# cell count — at the paper's K ~ sqrt(N) the augmented sf0.01 corpus
# (1000 vectors) sits near K=32; K=16 demonstrates the lever while
# keeping >= 2 planted duplicates per expected cell. The oracle
# replicates the doubled Lloyd chain exactly, so the gate proves cell
# assignment AND the within-cell pair stage at a second operating
# point.
_K_SCALED = 16


def dedup_semantic_k16(spark: SparkSession, sf: str) -> DataFrame:
    return dedup_semantic(spark, sf, k=_K_SCALED)


QUERIES = {
    "dedup_semantic": QuerySpec(dedup_semantic, _semdedup_sql()),
    "dedup_semantic_k16": QuerySpec(
        dedup_semantic_k16, _semdedup_sql(_K_SCALED)
    ),
}
