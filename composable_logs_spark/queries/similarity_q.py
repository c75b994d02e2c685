"""Similarity search over the embeddings table (north-star L5).

- ``ann_cosine_top5``: brute-force cosine top-k — the exactness baseline.
  The query side is tiny (10 vectors) and broadcast; the corpus side
  streams through one pass. At 100 TB this is the scan-everything
  fallback; cost is one pass per query batch, no shuffle.
- ``ann_ivf_label_probe``: IVF-style scale path — the corpus is
  partitioned by a coarse quantization key (here the ``label`` column
  stands in for a k-means centroid id) and only the probe cell is
  scanned: an equi-join replaces the full scan.

Both compute cosine in double precision with built-in higher-order
functions (zip_with/aggregate) — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load

_N_QUERIES = 10
_TOP_K = 5
_SALT_BUCKETS = 32


def _topk_two_phase(scored: DataFrame, k: int, extra_cols: list[str]) -> DataFrame:
    """Two-phase top-k per query: local top-k within salt buckets, then a
    global merge over only ``buckets * k`` rows per query.

    A single ``row_number() OVER (PARTITION BY query_id)`` would shuffle
    *every* scored row into ``#queries`` reducer partitions — a
    parallelism collapse at scale. Salting by a hash of the candidate id
    spreads phase 1 over ``#queries * _SALT_BUCKETS`` reducers; phase 2
    sees at most ``_SALT_BUCKETS * k`` rows per query. Any global top-k
    member is necessarily a bucket-local top-k member, so results are
    identical (ties broken deterministically by vec_id on both phases).
    """
    salted = scored.withColumn(
        "_salt", F.pmod(F.hash(F.col("vec_id")), F.lit(_SALT_BUCKETS))
    )
    order = [F.col("cosine").desc(), F.col("vec_id")]
    local_w = W.partitionBy("query_id", "_salt").orderBy(*order)
    local = (
        salted.withColumn("_lr", F.row_number().over(local_w))
        .where(F.col("_lr") <= k)
    )
    global_w = W.partitionBy("query_id").orderBy(*order)
    return (
        local.withColumn("rank", F.row_number().over(global_w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), *extra_cols, "cosine", "rank"
        )
    )


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def ann_cosine_top5(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force exact cosine top-k — the scan-everything baseline.

    r13 (guide §4.2): the scoring pass moved from interpreted
    higher-order-function expressions (zip_with + aggregate evaluate a
    lambda per element: 64 dims x 10 queries x N rows of non-codegen
    work) to one vectorized numpy pass per Arrow batch. The arithmetic
    is BIT-IDENTICAL to the old expression: numpy accumulates the dot
    product and squared norm dimension-at-a-time in float64 — the same
    left-to-right fold, the same IEEE ops in the same order — and the
    4dp rounding stays in Spark (F.round is HALF_UP; numpy rounds
    half-even), verified exact on the full corpus before the switch.
    The query vectors (vec_id < N) are re-read per task from the input
    parquet with a pushed-down row-group filter — heavyweight init once
    per task (guide §4.5), never a driver collect in the query path.
    """
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    qpath = f"{sf}/embeddings.parquet"
    n_queries = _N_QUERIES

    def score(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        def seq_sq_norm(m):
            # sqrt of the left-to-right fold of x*x — matches
            # F.aggregate(vec, 0.0, (a, x) -> a + x * x) bit-for-bit
            acc = np.zeros(m.shape[0], dtype=np.float64)
            for i in range(m.shape[1]):
                acc = acc + m[:, i] * m[:, i]
            return np.sqrt(acc)

        # per-task panel read: qpath must be executor-readable (true for
        # any shared-storage deployment; the filters kwarg pushes the
        # vec_id predicate into the parquet scan, so only the bounded
        # query panel is materialized)
        qt = pq.read_table(
            qpath,
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", n_queries)],
        )
        q_ids = qt.column("vec_id").to_numpy()
        order = np.argsort(q_ids)
        q_ids = q_ids[order]
        qm = (
            qt.column("embedding")
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(q_ids), -1)[order]
        )
        qnorm = seq_sq_norm(qm)
        dim = qm.shape[1]
        for batch in batches:
            ids = batch.column(0).to_numpy()
            flat = batch.column(1).flatten().to_numpy(zero_copy_only=False)
            v = flat.astype(np.float64).reshape(len(ids), dim)
            norms = seq_sq_norm(v)
            out_q, out_v, out_c = [], [], []
            for k in range(len(q_ids)):
                dot = np.zeros(len(ids), dtype=np.float64)
                for i in range(dim):
                    dot = dot + v[:, i] * qm[k, i]
                cos = dot / (norms * qnorm[k])
                keep = ids != q_ids[k]
                out_q.append(np.full(int(keep.sum()), q_ids[k], dtype=np.int64))
                out_v.append(ids[keep])
                out_c.append(cos[keep])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q)),
                    pa.array(np.concatenate(out_v)),
                    pa.array(np.concatenate(out_c)),
                ],
                names=["query_id", "vec_id", "cosine"],
            )

    scored = e.mapInArrow(
        score, "query_id long, vec_id long, cosine double"
    ).withColumn("cosine", F.round("cosine", 4))
    return _topk_two_phase(scored, _TOP_K, extra_cols=[])


ANN_BRUTE_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm FROM e WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_sum(list_transform(range(1, 65), i -> e.vec[i] * q.qvec[i]))
               / (e.nrm * q.qnrm), 4) AS cosine
  FROM e JOIN q ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


def ann_ivf_label_probe(spark: SparkSession, sf: str) -> DataFrame:
    """IVF probe: only the query's own cell (label) is scanned."""
    e = load(spark, sf, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("vec")
    )
    e = e.withColumn("norm", _norm(F.col("vec")))
    queries = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        e.join(
            F.broadcast(queries),
            (F.col("label") == F.col("qlabel")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4
            ),
        )
    )
    return _topk_two_phase(scored, _TOP_K, extra_cols=["label"])


ANN_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, label AS qlabel, vec AS qvec, nrm AS qnrm
      FROM e WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
         round(list_sum(list_transform(range(1, 65), i -> e.vec[i] * q.qvec[i]))
               / (e.nrm * q.qnrm), 4) AS cosine
  FROM e JOIN q ON e.label = q.qlabel AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, label, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


# ---------------------------------------------------------------------------
# IVF with a REAL k-means assignment (round-2: `label` was a stand-in for
# the centroid id). Unrolled Lloyd iterations as pure DataFrame ops — the
# same shape MLlib's KMeans uses: centroids broadcast (K rows), each
# assignment is a crossJoin + argmin (one pass over the corpus, no
# shuffle of the big side beyond the groupBy), each recompute is an
# explode + hash-agg (map-side combine; shuffle carries K*dim rows).
#
# Cross-engine exactness: centroid coordinates and distances are rounded
# to 6dp on BOTH engines before comparisons, and argmin ties break on the
# cell id (struct-min in Spark ≙ ORDER BY dist, cell in SQL), so
# double-summation-order differences cannot flip an assignment.
_KM_K = 8
_KM_ITERS = 2


def _km_assign(corpus: DataFrame, cents: DataFrame) -> DataFrame:
    d2 = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        corpus.crossJoin(F.broadcast(cents))
        .withColumn("dist_r", F.round(d2, 6))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("dist_r", "cell")).alias("_m"),
            F.first("vec").alias("vec"),  # vec constant per vec_id
        )
        .select("vec_id", "vec", F.col("_m.cell").alias("cell"))
    )


def _km_recompute(assigned: DataFrame) -> DataFrame:
    per_dim = (
        assigned.select("cell", F.posexplode("vec").alias("dim", "val"))
        .groupBy("cell", "dim")
        .agg(F.round(F.avg("val"), 6).alias("m"))
    )
    return per_dim.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("cvec")
    )


def ann_ivf_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    corpus, cents = _train_kmeans(spark, sf)
    # r13: materialize — referenced by queries AND scored (guide §3.3)
    final = (
        _km_assign(corpus, cents)
        .withColumn("norm", _norm(F.col("vec")))
        .localCheckpoint(eager=True)
    )
    queries = final.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("cell").alias("qcell"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        final.join(
            F.broadcast(queries),
            (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4
            ),
        )
    )
    return _topk_two_phase(scored, _TOP_K, extra_cols=["cell"])


def _train_kmeans_on(corpus: DataFrame, k: int = _KM_K) -> DataFrame:
    """Unrolled deterministic Lloyd loop over any (vec_id, vec) corpus
    (init: the k lowest vec_ids) -> final centroids.

    k is THE scale lever for every consumer (IVF cell count, SemDeDup
    cell bound — the paper's K ~ sqrt(N)): cell-bounded pair/probe
    stages shrink quadratically as k grows, while the only k-costs are
    the broadcast centroid table (k x dim doubles) and the argmin."""
    cents = corpus.where(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("vec").alias("cvec")
    )
    for _ in range(_KM_ITERS):
        # r13 (guide §3.3/§5): eager localCheckpoint per round — the
        # nested assign(recompute(assign(...))) lineage otherwise
        # doubles per iteration AND re-executes once per downstream
        # consumer (every ANN/SemDeDup query references the centroid
        # table several times with no shared-subtree reuse). K x dim
        # rows, recomputed per invocation — nothing persists across runs.
        cents = _km_recompute(_km_assign(corpus, cents)).localCheckpoint(
            eager=True
        )
    return cents


def _train_kmeans(spark: SparkSession, sf: str):
    """Shared IVF training: unrolled Lloyd loop -> (corpus, centroids)."""
    corpus = load(spark, sf, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("vec")
    )
    return corpus, _train_kmeans_on(corpus)


_KM_CORPUS_SQL = (
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings"
)


def _km_cte_chain(
    corpus_sql: str = _KM_CORPUS_SQL,
    k: int = _KM_K,
    final_assign_src: str | None = None,
) -> tuple[list[str], str]:
    """The unrolled-Lloyd CTE chain through ``finaln`` (assigned +
    normed corpus); returns (ctes, name of the final centroid CTE) so
    the k-means probe, the multi-probe query, and SemDeDup (which
    trains over an AUGMENTED corpus with its own cell count, hence the
    parameters) share it. ``final_assign_src`` lets the mini-batch
    variant (cluster_docs_q) TRAIN on a sampled corpus while the final
    assignment pass covers a different (full) relation."""

    def assign(cent_cte: str, src: str) -> str:
        return f"""(
  SELECT vec_id, vec, cell FROM (
    SELECT c.vec_id, c.vec, ct.cell,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY round(list_sum(list_transform(range(1, 65),
                        j -> (c.vec[j] - ct.cvec[j]) * (c.vec[j] - ct.cvec[j]))), 6),
                      ct.cell) AS rn
    FROM {src} c CROSS JOIN {cent_cte} ct
  ) WHERE rn = 1
)"""

    def recompute(assign_cte: str) -> str:
        return f"""(
  SELECT cell, list(m ORDER BY dim) AS cvec FROM (
    SELECT cell, dim, round(avg(val), 6) AS m
    FROM (SELECT cell, unnest(vec) AS val, generate_subscripts(vec, 1) AS dim
          FROM {assign_cte})
    GROUP BY cell, dim
  ) GROUP BY cell
)"""

    ctes = [
        f"corpus AS ({corpus_sql})",
        f"cent0 AS (SELECT CAST(vec_id AS INT) AS cell, vec AS cvec FROM corpus WHERE vec_id < {k})",
    ]
    prev_cent = "cent0"
    for i in range(1, _KM_ITERS + 1):
        ctes.append(f"assign{i} AS {assign(prev_cent, 'corpus')}")
        ctes.append(f"cent{i} AS {recompute(f'assign{i}')}")
        prev_cent = f"cent{i}"
    ctes.append(
        f"finala AS {assign(prev_cent, final_assign_src or 'corpus')}"
    )
    ctes.append(
        """finaln AS (
  SELECT vec_id, vec, cell,
         sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
  FROM finala
)"""
    )
    return ctes, prev_cent


def _km_sql() -> str:
    ctes, _ = _km_cte_chain()
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
q AS (SELECT vec_id AS query_id, cell AS qcell, vec AS qvec, nrm AS qnrm
      FROM finaln WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.query_id, f.vec_id AS neighbor_id, f.cell,
         round(list_sum(list_transform(range(1, 65), j -> f.vec[j] * q.qvec[j]))
               / (f.nrm * q.qnrm), 4) AS cosine
  FROM finaln f JOIN q ON f.cell = q.qcell AND f.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cell, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""
    )


# ---------------------------------------------------------------------------
# Product quantization + asymmetric distance computation (PQ-ADC) — the
# memory-bounded ANN scale path: 64-dim vectors compress to _PQ_M
# one-byte codes (a 16x memory cut at these parameters; real deployments
# use 8-32x), and query-time distance is a TABLE LOOKUP, not vector
# math.
#
# - Train: independent k-means per 16-dim subspace (same deterministic
#   unrolled Lloyd recipe as ann_ivf_kmeans: round-6dp distances,
#   cell-id tie-break, round-6dp centroid means).
# - Encode: each corpus vector -> _PQ_M nearest-codeword ids. At 100 TB
#   the codes table is what lives in memory; raw vectors stay on disk.
# - Search: per-query distance table (queries x subspaces x codewords =
#   tiny, broadcast) joins the codes on (subspace, code); per-pair ADC
#   distance is an integer sum of the 4 looked-up cells (scaled-integer:
#   bit-exact across engines), then the salted two-phase top-k.
_PQ_M = 4          # subspaces
_PQ_SUBDIM = 16    # dims per subspace (4 x 16 = 64)
_PQ_K = 8          # codewords per subspace
_PQ_ITERS = 2


def _pq_subvectors(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    """(vec_id, vec) -> (vec_id, m, svec): one row per subspace slice."""
    slices = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col(vec_col), m * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("svec"),
            )
            for m in range(_PQ_M)
        ]
    )
    return df.select("vec_id", F.explode(slices).alias("s")).select(
        "vec_id", "s.m", "s.svec"
    )


def _pq_assign(subvecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest codeword per (vec_id, m): join on subspace, argmin with
    round-6dp distance and cell tie-break (cross-engine deterministic)."""
    d2 = F.aggregate(
        F.zip_with(F.col("svec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        subvecs.join(F.broadcast(cents), "m")
        .withColumn("dist_r", F.round(d2, 6))
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("dist_r", "cell")).alias("_a"), F.first("svec").alias("svec"))
        .select("vec_id", "m", F.col("_a.cell").alias("cell"), "svec")
    )


def _pq_recompute(assigned: DataFrame) -> DataFrame:
    per_dim = (
        assigned.select("m", "cell", F.posexplode("svec").alias("dim", "val"))
        .groupBy("m", "cell", "dim")
        .agg(F.round(F.avg("val"), 6).alias("mu"))
    )
    return per_dim.groupBy("m", "cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mu"))), lambda s: s["mu"]
        ).alias("cvec")
    )


def ann_pq_adc(spark: SparkSession, sf: str) -> DataFrame:
    corpus = load(spark, sf, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("vec")
    )
    subvecs = _pq_subvectors(corpus)
    cents = subvecs.where(F.col("vec_id") < _PQ_K).select(
        "m", F.col("vec_id").cast("int").alias("cell"), F.col("svec").alias("cvec")
    )
    for _ in range(_PQ_ITERS):
        # r13: per-round materialization (see _train_kmeans_on)
        cents = _pq_recompute(_pq_assign(subvecs, cents)).localCheckpoint(
            eager=True
        )
    codes = _pq_assign(subvecs, cents).select("vec_id", "m", "cell")

    qsub = _pq_subvectors(corpus.where(F.col("vec_id") < _N_QUERIES)).select(
        F.col("vec_id").alias("query_id"), "m", F.col("svec").alias("qsvec")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qsvec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    # scaled-integer lookup cells: the 4-term ADC sum is exact longs, so
    # parallel summation order cannot flip the hash
    dtab = (
        qsub.join(F.broadcast(cents), "m")
        .select(
            "query_id",
            "m",
            "cell",
            F.round(d2 * 1e6).cast("long").alias("d2_micro"),
        )
    )
    # keep the distance in exact integer micro-units end-to-end: a
    # round(sum/1e6, 4) here would reintroduce the Spark-HALF_UP vs
    # DuckDB-binary rounding-tie hazard whenever sum % 100 == 50 (the
    # same hazard embedding_int8_quant documents for recon_rmse_micro)
    pairs = (
        codes.join(F.broadcast(dtab), ["m", "cell"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2_micro").alias("adc_d2_micro"))
    )
    # salted two-phase top-k, ascending distance (see _topk_two_phase)
    salted = pairs.withColumn(
        "_salt", F.pmod(F.hash(F.col("vec_id")), F.lit(_SALT_BUCKETS))
    )
    order = [F.col("adc_d2_micro").asc(), F.col("vec_id")]
    local = (
        salted.withColumn(
            "_lr", F.row_number().over(W.partitionBy("query_id", "_salt").orderBy(*order))
        )
        .where(F.col("_lr") <= _TOP_K)
    )
    return (
        local.withColumn(
            "rank", F.row_number().over(W.partitionBy("query_id").orderBy(*order))
        )
        .where(F.col("rank") <= _TOP_K)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "adc_d2_micro", "rank"
        )
    )


def _pq_cte_chain(include_corpus: bool = True) -> list[str]:
    """The PQ training/encode/distance-table CTE chain (through
    ``codes``, ``qsub`` and ``dtab``); PQ-internal names are prefixed
    ``pq`` so the chain composes with ``_km_cte_chain`` (IVF-PQ)."""
    sub = f"""(
  SELECT vec_id, m, list_slice(vec, m * {_PQ_SUBDIM} + 1, (m + 1) * {_PQ_SUBDIM}) AS svec
  FROM {{src}} CROSS JOIN (SELECT unnest(range({_PQ_M})) AS m)
)"""

    def assign(cent_cte: str) -> str:
        return f"""(
  SELECT vec_id, m, cell, svec FROM (
    SELECT s.vec_id, s.m, c.cell, s.svec,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY round(list_sum(list_transform(range(1, {_PQ_SUBDIM} + 1),
                        j -> (s.svec[j] - c.cvec[j]) * (s.svec[j] - c.cvec[j]))), 6),
                      c.cell) AS rn
    FROM subvecs s JOIN {cent_cte} c USING (m)
  ) WHERE rn = 1
)"""

    def recompute(assign_cte: str) -> str:
        return f"""(
  SELECT m, cell, list(mu ORDER BY dim) AS cvec FROM (
    SELECT m, cell, dim, round(avg(val), 6) AS mu
    FROM (SELECT m, cell, unnest(svec) AS val, generate_subscripts(svec, 1) AS dim
          FROM {assign_cte})
    GROUP BY m, cell, dim
  ) GROUP BY m, cell
)"""

    ctes = (
        [
            "corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)"
        ]
        if include_corpus
        else []
    )
    ctes += [
        "subvecs AS " + sub.format(src="corpus"),
        f"""pqcent0 AS (
  SELECT m, CAST(vec_id AS INT) AS cell, svec AS cvec
  FROM subvecs WHERE vec_id < {_PQ_K}
)""",
    ]
    prev = "pqcent0"
    for i in range(1, _PQ_ITERS + 1):
        ctes.append(f"pqassign{i} AS {assign(prev)}")
        ctes.append(f"pqcent{i} AS {recompute(f'pqassign{i}')}")
        prev = f"pqcent{i}"
    ctes.append(f"codes AS (SELECT vec_id, m, cell FROM {assign(prev)})")
    ctes.append(
        f"""qsub AS (
  SELECT vec_id AS query_id, m, svec AS qsvec
  FROM subvecs WHERE vec_id < {_N_QUERIES}
)"""
    )
    ctes.append(
        f"""dtab AS (
  SELECT q.query_id, q.m, c.cell,
         CAST(round(list_sum(list_transform(range(1, {_PQ_SUBDIM} + 1),
                j -> (q.qsvec[j] - c.cvec[j]) * (q.qsvec[j] - c.cvec[j]))) * 1000000, 0)
              AS BIGINT) AS d2_micro
  FROM qsub q JOIN {prev} c USING (m)
)"""
    )
    return ctes


def _pq_sql() -> str:
    ctes = _pq_cte_chain()
    ctes.append(
        """pairs AS (
  SELECT d.query_id, co.vec_id,
         CAST(sum(d.d2_micro) AS BIGINT) AS adc_d2_micro
  FROM codes co JOIN dtab d ON co.m = d.m AND co.cell = d.cell
  WHERE co.vec_id <> d.query_id
  GROUP BY d.query_id, co.vec_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, vec_id AS neighbor_id, adc_d2_micro, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc_d2_micro ASC, vec_id) AS INT) AS rank
  FROM pairs
) WHERE rank <= {_TOP_K}
"""
    )


# ---------------------------------------------------------------------------
# Symmetric int8 quantization of embeddings — the feature-store /
# vector-index prep step (4x memory cut vs float32, 8x vs double).
# Per-vector max-abs scale; components map to round(v/scale*127).
# Output is the audit summary (scale, saturation count, reconstruction
# RMSE) rather than the int8 array itself so the gate hashes scalars.
# Pure per-row array math: zero shuffle, whole-stage codegen; both
# engines fold arrays sequentially so the per-vector sums are
# order-identical.
def embedding_int8_quant(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("vec")
    )
    scale = F.array_max(F.transform(F.col("vec"), F.abs))
    q = F.transform(F.col("vec"), lambda x: F.round(x / F.col("scale") * 127).cast("int"))
    dq_err2 = F.aggregate(
        F.zip_with(
            F.col("vec"),
            F.col("q"),
            lambda v, qi: (v - qi.cast("double") * F.col("scale") / 127)
            * (v - qi.cast("double") * F.col("scale") / 127),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    # Exactness: scale and the error sum are bit-identical on both
    # engines (same sequential array folds), so `scale` ships unrounded.
    # The RMSE ships as INTEGER micro-units: round(x*1e6) to an integer
    # is safe because half-integers are exactly representable doubles,
    # whereas round(x, 6) on a tiny double diverges between Spark
    # (shortest-decimal-repr HALF_UP) and DuckDB (exact-binary) whenever
    # the shortest repr ends in ...5 — observed twice in 640 rows.
    rmse_micro = F.round(F.sqrt(dq_err2 / F.size("vec")) * 1e6).cast("long")
    return (
        e.withColumn("scale", scale)
        .withColumn("q", q)
        .select(
            "vec_id",
            "scale",
            F.size(F.filter(F.col("q"), lambda x: F.abs(x) == 127)).alias("n_saturated"),
            rmse_micro.alias("recon_rmse_micro"),
        )
    )


INT8_QUANT_SQL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
s AS (
  SELECT vec_id, vec,
         list_max(list_transform(vec, x -> abs(x))) AS scale
  FROM e
),
q AS (
  SELECT vec_id, vec, scale,
         list_transform(vec, x -> CAST(round(x / scale * 127, 0) AS INT)) AS qv
  FROM s
)
SELECT vec_id,
       scale,
       CAST(len(list_filter(qv, x -> abs(x) = 127)) AS INT) AS n_saturated,
       CAST(round(sqrt(list_sum(list_transform(range(1, len(vec) + 1),
              j -> (vec[j] - qv[j] * scale / 127) * (vec[j] - qv[j] * scale / 127)))
             / len(vec)) * 1000000, 0) AS BIGINT) AS recon_rmse_micro
FROM q
"""


# ---------------------------------------------------------------------------
# Per-label embedding centroids via posexplode + hash agg. Float sums are
# summation-order-dependent, so both engines would disagree in the last
# ulps under parallel aggregation; we sum SCALED INTEGERS (round(v*1e6)
# as long — exact, associative, order-free) and divide once at the end.
# Scale shape: the explode fans out rows x dims, but map-side combine
# collapses to |labels x dims| before the only shuffle; the per-cell
# state is one long.
def embedding_centroids(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    cell = e.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select("label", "dim", F.round(F.col("v") * 1e6).cast("long").alias("iv"))
    return cell.groupBy("label", "dim").agg(
        F.count("*").alias("n"),
        F.round(F.sum("iv") / (F.count("*") * 1e6), 4).alias("centroid"),
    )


CENTROID_SQL = """
WITH raw AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS dim1,
         unnest(embedding) AS v
  FROM embeddings
), cell AS (
  SELECT label, dim1 - 1 AS dim,
         CAST(round(v * 1000000, 0) AS BIGINT) AS iv
  FROM raw
)
SELECT label, CAST(dim AS INT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(iv) / (count(*) * 1000000.0), 4) AS centroid
FROM cell GROUP BY label, dim
"""


# ---------------------------------------------------------------------------
# Per-label PCA (top principal component) — MLlib's shape: the only
# distributed pass accumulates per-label SECOND-MOMENT PARTIALS
# (n, sum x, sum x x^T) map-side via mapInPandas, reduced with one hash
# agg; the d x d covariance that falls out is tiny (labels x d^2
# doubles), so the fixed-iteration power method runs on the driver —
# exactly how Spark MLlib's RowMatrix.computePrincipalComponents
# collects the Gram matrix and eigensolves driver-side. The previous
# formulation (groupBy(label).applyInPandas) collected EVERY vector of
# a label into one executor's pandas frame — at 100 TB a popular label
# OOMs; here per-task state is one d x (d+1) accumulator regardless of
# group size, and the shuffle is |batches| x |labels| x d(d+1) floats,
# not the corpus.
#
# Deterministic: fixed-iteration power method from a fixed init, sign
# normalised on the largest-magnitude entry. The oracle replicates the
# IDENTICAL recurrence in DuckDB SQL (chained CTEs of matrix-vector
# products over the per-label covariance); partial-sum order differs
# between engines but convergence contraction keeps the float noise far
# below the 4dp rounding. Invariants (unit norm, determinism, variance,
# parity with a whole-group numpy PCA) are pytest-gated.
_PCA_ITERS = 50


def _pca_power_iterate(cov):
    """The shared recurrence: 50 x (multiply, normalise), sign flip on
    the largest-|entry| (ties -> lowest dim, matching the SQL oracle)."""
    import numpy as np

    v = np.ones(cov.shape[0]) / np.sqrt(cov.shape[0])
    for _ in range(_PCA_ITERS):
        v = cov @ v
        n = np.linalg.norm(v)
        if n == 0.0:
            break
        v = v / n
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    return v, float(v @ cov @ v)


def embedding_pca_top1(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np

    def moment_partials(batches):
        import pandas as pd

        for pdf in batches:
            for label, grp in pdf.groupby("label"):
                X = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
                acc = np.concatenate([X.sum(axis=0), (X.T @ X).ravel()])
                yield pd.DataFrame(
                    {"label": [int(label)], "n": [len(X)], "acc": [acc.tolist()]}
                )

    e = load(spark, sf, "embeddings").select("label", "embedding")
    parts = e.mapInPandas(
        moment_partials, "label int, n long, acc array<double>"
    )
    # elementwise array-sum reduce: explode the fixed-size accumulator to
    # (label, pos) cells — map-side combined, |labels| x d(d+1) rows total
    moments = (
        parts.select("label", "n", F.posexplode("acc").alias("pos", "val"))
        .groupBy("label", "pos")
        # every (label, pos) group sees one row per partial, so sum(n)
        # is the label's total row count in every group
        .agg(F.sum("val").alias("s"), F.sum("n").alias("n"))
    )
    rows = moments.groupBy("label").agg(
        F.max("n").alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda x: x["s"]
        ).alias("acc"),
    ).collect()

    out = []
    for r in rows:
        n, acc = r["n"], np.asarray(r["acc"])
        d = int((np.sqrt(4 * len(acc) + 1) - 1) / 2)  # len = d + d^2
        mu = acc[:d] / n
        cov = acc[d:].reshape(d, d) / n - np.outer(mu, mu)
        v, ev = _pca_power_iterate(cov)
        out.extend(
            (r["label"], i, float(v[i]), ev) for i in range(d)
        )
    res = spark.createDataFrame(
        out, "label int, dim int, component double, explained_var double"
    )
    # round OUTSIDE the numpy path (HALF_UP, not banker's); 4dp leaves ~8
    # orders of magnitude of headroom over cross-engine float noise
    return res.select(
        "label",
        "dim",
        F.round("component", 4).alias("component"),
        F.round("explained_var", 4).alias("explained_var"),
    )


def _pca_sql() -> str:
    """DuckDB replica of the UDF's power method: same centering, same
    all-ones/sqrt(d) init, same per-iteration normalisation, same
    largest-|v|-entry-positive sign flip (ties -> lowest dim, matching
    numpy argmax)."""
    ctes = [
        """base AS MATERIALIZED (
  SELECT label, vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
)""",
        "mu AS MATERIALIZED (SELECT label, dim, avg(x) AS m FROM base GROUP BY label, dim)",
        """cen AS MATERIALIZED (
  SELECT b.label, b.vec_id, b.dim, b.x - mu.m AS cx
  FROM base b JOIN mu ON mu.label = b.label AND mu.dim = b.dim
)""",
        "nl AS MATERIALIZED (SELECT label, count(DISTINCT vec_id) AS n FROM base GROUP BY label)",
        """cov AS MATERIALIZED (
  SELECT a.label, a.dim AS i, b.dim AS j, sum(a.cx * b.cx) / max(nl.n) AS c
  FROM cen a
  JOIN cen b ON a.label = b.label AND a.vec_id = b.vec_id
  JOIN nl ON nl.label = a.label
  GROUP BY a.label, a.dim, b.dim
)""",
        """d AS MATERIALIZED (SELECT label, count(*) AS nd FROM mu GROUP BY label)""",
        """v0 AS MATERIALIZED (
  SELECT mu.label, mu.dim, 1.0 / sqrt(d.nd) AS v
  FROM mu JOIN d ON d.label = mu.label
)""",
    ]
    prev = "v0"
    for k in range(1, _PCA_ITERS + 1):
        ctes.append(
            f"""v{k} AS MATERIALIZED (
  SELECT label, dim, w / sqrt(sum(w * w) OVER (PARTITION BY label)) AS v
  FROM (SELECT c.label, c.i AS dim, sum(c.c * v.v) AS w
        FROM cov c JOIN {prev} v ON v.label = c.label AND v.dim = c.j
        GROUP BY c.label, c.i)
)"""
        )
        prev = f"v{k}"
    ctes.append(
        f"""sgn AS MATERIALIZED (
  SELECT label, CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
  FROM (SELECT label, v,
               row_number() OVER (PARTITION BY label ORDER BY abs(v) DESC, dim ASC) AS rn
        FROM {prev})
  WHERE rn = 1
)"""
    )
    ctes.append(
        f"""ev AS MATERIALIZED (
  SELECT c.label, sum(vi.v * c.c * vj.v) AS ev
  FROM cov c
  JOIN {prev} vi ON vi.label = c.label AND vi.dim = c.i
  JOIN {prev} vj ON vj.label = c.label AND vj.dim = c.j
  GROUP BY c.label
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v.label, CAST(v.dim AS INT) AS dim,
       round(v.v * sgn.s, 4) AS component,
       round(ev.ev, 4) AS explained_var
FROM {prev} v JOIN sgn USING (label) JOIN ev USING (label)"""
    )


# ---------------------------------------------------------------------------
def ann_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of the IVF probe against exact brute force, per query —
    the quality metric every approximate vector index must report
    alongside its speedup (without it, "fast ANN" is unfalsifiable).

    Both sides reuse the existing two-phase salted top-k programs; the
    recall join runs on (query_id, neighbor_id) over k x |queries| rows
    — negligible at any scale. A left join from the exact set counts
    how many true neighbors the probe recovered.
    """
    exact = ann_cosine_top5(spark, sf).select("query_id", "neighbor_id")
    ivf = ann_ivf_label_probe(spark, sf).select(
        "query_id", F.col("neighbor_id").alias("ivf_neighbor")
    )
    return (
        exact.join(
            ivf,
            (exact["query_id"] == ivf["query_id"])
            & (F.col("neighbor_id") == F.col("ivf_neighbor")),
            "left",
        )
        .groupBy(exact["query_id"])
        .agg(
            F.count("ivf_neighbor").alias("n_hits"),
            F.round(F.count("ivf_neighbor") / F.lit(float(_TOP_K)), 4).alias(
                "recall"
            ),
        )
        .orderBy("query_id")
    )


def _recall_sql() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, label AS qlabel, vec AS qvec, nrm AS qnrm
      FROM e WHERE vec_id < {_N_QUERIES}),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_sum(list_transform(range(1, 65),
                              i -> e.vec[i] * q.qvec[i])) / (e.nrm * q.qnrm), 4)
                        DESC, e.vec_id) AS rank
    FROM e JOIN q ON e.vec_id <> q.query_id
  ) WHERE rank <= {_TOP_K}
),
ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_sum(list_transform(range(1, 65),
                              i -> e.vec[i] * q.qvec[i])) / (e.nrm * q.qnrm), 4)
                        DESC, e.vec_id) AS rank
    FROM e JOIN q ON e.label = q.qlabel AND e.vec_id <> q.query_id
  ) WHERE rank <= {_TOP_K}
)
SELECT x.query_id,
       CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
       round(count(i.neighbor_id) / CAST({_TOP_K} AS DOUBLE), 4) AS recall
FROM exact x LEFT JOIN ivf i
  ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
GROUP BY x.query_id
ORDER BY x.query_id
"""


# ---------------------------------------------------------------------------
# Multi-probe IVF: real IVF indexes probe the nprobe NEAREST cells (by
# query-to-centroid distance), trading scan width for recall. This wires
# nprobe into the recall harness: recall@5 per query at nprobe 1/2/4
# over the SAME k-means cells as ann_ivf_kmeans — recall must rise
# monotonically with nprobe (a probed candidate set only grows, and a
# true global-top-5 neighbor can only be outranked by other global-top-5
# vectors, so it never falls out of a larger probe's top-5).
#
# Scale shape: cell ranking is queries x K against the BROADCAST
# centroid table (K rows); candidate fetch is an equi-join of the
# corpus on cell against the broadcast (query, probed-cell) set — never
# all-pairs. Everything downstream runs on |queries| * k rows.
_NPROBES = [1, 2, 4]


def ann_ivf_multiprobe(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    corpus, cents = _train_kmeans(spark, sf)
    # r13: materialize — referenced by queries AND cand (guide §3.3)
    final = (
        _km_assign(corpus, cents)
        .withColumn("norm", _norm(F.col("vec")))
        .localCheckpoint(eager=True)
    )
    queries = final.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    # rank ALL cells per query by centroid distance (6dp + cell-id
    # tie-break, the assignment's own convention)
    d2 = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    probed = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("dist_r", F.round(d2, 6))
        .withColumn(
            "crank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("dist_r", "cell")
            ),
        )
        .where(F.col("crank") <= max(_NPROBES))
        .select("query_id", "qvec", "qnorm", "cell", "crank")
    )
    cand = (
        final.join(F.broadcast(probed), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("vec"), F.col("qvec"))
                / (F.col("norm") * F.col("qnorm")),
                4,
            ),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "crank")
    )
    nprobe = spark.createDataFrame(
        [(n,) for n in _NPROBES], "nprobe int"
    )
    ranked = (
        cand.join(F.broadcast(nprobe), F.col("crank") <= F.col("nprobe"))
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("nprobe", "query_id").orderBy(
                    F.col("cosine").desc(), "neighbor_id"
                )
            ),
        )
        .where(F.col("rank") <= _TOP_K)
        .select(
            F.col("nprobe").alias("r_nprobe"),
            F.col("query_id").alias("r_query"),
            F.col("neighbor_id").alias("r_neighbor"),
        )
    )
    exact = ann_cosine_top5(spark, sf).select(
        "query_id", F.col("neighbor_id").alias("true_neighbor")
    )
    # (nprobe x exact) LEFT JOIN found: a true neighbor missed at some
    # nprobe must still count in that nprobe's denominator
    base = exact.crossJoin(F.broadcast(nprobe))
    return (
        base.join(
            ranked,
            (base["nprobe"] == ranked["r_nprobe"])
            & (base["query_id"] == ranked["r_query"])
            & (base["true_neighbor"] == ranked["r_neighbor"]),
            "left",
        )
        .groupBy("nprobe", "query_id")
        .agg(
            F.count("r_neighbor").alias("n_hits"),
            F.round(F.count("r_neighbor") / F.lit(float(_TOP_K)), 4).alias(
                "recall"
            ),
        )
        .orderBy("nprobe", "query_id")
    )


def _multiprobe_sql() -> str:
    ctes, final_cent = _km_cte_chain()
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
q AS (SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm
      FROM finaln WHERE vec_id < {_N_QUERIES}),
probed AS (
  SELECT query_id, qvec, qnrm, cell, crank FROM (
    SELECT q.query_id, q.qvec, q.qnrm, ct.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_sum(list_transform(range(1, 65),
                        j -> (q.qvec[j] - ct.cvec[j]) * (q.qvec[j] - ct.cvec[j]))), 6),
                      ct.cell) AS crank
    FROM q CROSS JOIN {final_cent} ct
  ) WHERE crank <= {max(_NPROBES)}
),
cand AS (
  SELECT p.query_id, f.vec_id AS neighbor_id,
         round(list_sum(list_transform(range(1, 65), j -> f.vec[j] * p.qvec[j]))
               / (f.nrm * p.qnrm), 4) AS cosine,
         p.crank
  FROM finaln f JOIN probed p ON f.cell = p.cell AND f.vec_id <> p.query_id
),
ranked AS (
  -- NB: the inner np alias must NOT be referenced qualified out here:
  -- DuckDB inlines the CTE into the main query, where a DIFFERENT np
  -- alias is in scope, and the qualified ref silently binds to THAT
  -- (observed: join condition became trivially true, recall 2.8)
  SELECT nprobe, query_id, neighbor_id FROM (
    SELECT c.*, np.nprobe,
           row_number() OVER (PARTITION BY np.nprobe, c.query_id
                              ORDER BY c.cosine DESC, c.neighbor_id) AS rank
    FROM cand c JOIN (VALUES {", ".join(f"({n})" for n in _NPROBES)}) np(nprobe)
      ON c.crank <= np.nprobe
  ) WHERE rank <= {_TOP_K}
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_sum(list_transform(range(1, 65),
                              i -> e.vec[i] * q.qvec[i])) / (e.nrm * q.qnrm), 4)
                        DESC, e.vec_id) AS rank
    FROM finaln e JOIN q ON e.vec_id <> q.query_id
  ) WHERE rank <= {_TOP_K}
)
SELECT np.nprobe, x.query_id,
       CAST(count(r.neighbor_id) AS BIGINT) AS n_hits,
       round(count(r.neighbor_id) / CAST({_TOP_K} AS DOUBLE), 4) AS recall
FROM (VALUES {", ".join(f"({n})" for n in _NPROBES)}) np(nprobe)
CROSS JOIN exact x
LEFT JOIN ranked r
  ON r.nprobe = np.nprobe AND r.query_id = x.query_id
  AND r.neighbor_id = x.neighbor_id
GROUP BY np.nprobe, x.query_id
ORDER BY np.nprobe, x.query_id
"""
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the canonical memory-bounded ANN index composition (what a
# FAISS IndexIVFPQ is) — a coarse k-means quantizer prunes the corpus
# to the nprobe nearest cells, and distances inside the probed cells
# are PQ-ADC table lookups instead of vector math. Composes the two
# existing trained stages verbatim (`_train_kmeans` + the `_pq_*`
# helpers), so the gate hash proves the COMPOSITION.
#
# Codes encode the raw vectors, not residuals (a residual-encoded
# variant needs per-cell codebooks; documented trade-off — the plan
# shape is identical). Scale: candidate set per query is ~nprobe/K of
# the corpus; the ADC join runs on candidate-sized input (codes join
# candidates BEFORE the distance-table join), lookup tables and
# centroids broadcast, top-k salted two-phase.
_IVFPQ_NPROBE = 2


def ann_ivfpq_adc(spark: SparkSession, sf: str) -> DataFrame:
    corpus, kcents = _train_kmeans(spark, sf)
    # r13: materialize the assignment — it is referenced by queries AND
    # cand below, and each reference re-executed the full k-means chain
    assigned = _km_assign(corpus, kcents).localCheckpoint(eager=True)

    subvecs = _pq_subvectors(corpus)
    pcents = subvecs.where(F.col("vec_id") < _PQ_K).select(
        "m", F.col("vec_id").cast("int").alias("cell"), F.col("svec").alias("cvec")
    )
    for _ in range(_PQ_ITERS):
        # r13: per-round materialization (see _train_kmeans_on)
        pcents = _pq_recompute(_pq_assign(subvecs, pcents)).localCheckpoint(
            eager=True
        )
    codes = _pq_assign(subvecs, pcents).select("vec_id", "m", "cell")

    queries = assigned.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    probed = (
        queries.crossJoin(F.broadcast(kcents))
        .withColumn("dist_r", F.round(d2, 6))
        .withColumn(
            "crank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("dist_r", "cell")
            ),
        )
        .where(F.col("crank") <= _IVFPQ_NPROBE)
        .select("query_id", "cell")
    )
    cand = (
        assigned.join(F.broadcast(probed), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )

    qsub = _pq_subvectors(corpus.where(F.col("vec_id") < _N_QUERIES)).select(
        F.col("vec_id").alias("query_id"), "m", F.col("svec").alias("qsvec")
    )
    pd2 = F.aggregate(
        F.zip_with(F.col("qsvec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    dtab = qsub.join(F.broadcast(pcents), "m").select(
        "query_id", "m", "cell", F.round(pd2 * 1e6).cast("long").alias("d2_micro")
    )
    # candidate restriction FIRST: the ADC sum runs on ~nprobe/K of the
    # corpus, which is the pruning IVF exists to buy
    pairs = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(dtab), ["query_id", "m", "cell"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2_micro").alias("adc_d2_micro"))
    )
    salted = pairs.withColumn(
        "_salt", F.pmod(F.hash(F.col("vec_id")), F.lit(_SALT_BUCKETS))
    )
    order = [F.col("adc_d2_micro").asc(), F.col("vec_id")]
    local = salted.withColumn(
        "_lr",
        F.row_number().over(W.partitionBy("query_id", "_salt").orderBy(*order)),
    ).where(F.col("_lr") <= _TOP_K)
    return (
        local.withColumn(
            "rank", F.row_number().over(W.partitionBy("query_id").orderBy(*order))
        )
        .where(F.col("rank") <= _TOP_K)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "adc_d2_micro", "rank"
        )
    )


# ---------------------------------------------------------------------------
# Residual-encoded IVF-PQ with PER-CELL codebooks — the accuracy-
# critical variant of the production index (FAISS IndexIVFPQ's
# by_residual encoding, taken one step further with a codebook per
# coarse cell): PQ codes quantize r = vec - coarse_centroid instead of
# the raw vector. Residuals have far smaller per-cell variance than raw
# vectors, and a per-cell codebook adapts to the local distribution, so
# the same code budget buys materially lower quantization error.
# Query-time ADC uses the identity ||q - (c + r_hat)||^2 =
# ||(q - c) - r_hat||^2: one distance table PER PROBED CELL against
# that cell's codebook (still tiny: nprobe x M x K rows per query,
# broadcast). Plan shape is the raw-coded ``ann_ivfpq_adc`` with
# (kcell) added to every PQ key — candidate restriction still happens
# BEFORE the ADC join.


def _rpq_assign(subvecs: DataFrame, cents: DataFrame) -> DataFrame:
    """_pq_assign with the coarse cell in the key: nearest codeword of
    the vector's OWN cell's codebook per (vec_id, kcell, m)."""
    d2 = F.aggregate(
        F.zip_with(F.col("svec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        subvecs.join(F.broadcast(cents), ["kcell", "m"])
        .withColumn("dist_r", F.round(d2, 6))
        .groupBy("vec_id", "kcell", "m")
        .agg(F.min(F.struct("dist_r", "cell")).alias("_a"), F.first("svec").alias("svec"))
        .select("vec_id", "kcell", "m", F.col("_a.cell").alias("cell"), "svec")
    )


def _rpq_recompute(assigned: DataFrame) -> DataFrame:
    per_dim = (
        assigned.select("kcell", "m", "cell", F.posexplode("svec").alias("dim", "val"))
        .groupBy("kcell", "m", "cell", "dim")
        .agg(F.round(F.avg("val"), 6).alias("mu"))
    )
    return per_dim.groupBy("kcell", "m", "cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mu"))), lambda s: s["mu"]
        ).alias("cvec")
    )


def _resid_subvectors(resid: DataFrame, vec_col: str) -> DataFrame:
    slices = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col(vec_col), m * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("svec"),
            )
            for m in range(_PQ_M)
        ]
    )
    return resid.select("*", F.explode(slices).alias("s")).select(
        *[c for c in resid.columns if c != vec_col], "s.m", "s.svec"
    )


def _residual_adc_pairs(spark: SparkSession, sf: str):
    """The shared residual-IVF-PQ candidate scorer: returns
    (pairs, assigned) where pairs = (query_id, vec_id, adc_d2_micro)
    over the probed cells — consumed by ann_ivfpq_residual (top-k on
    the ADC estimate) and ann_ivfpq_rerank (exact re-rank of the ADC
    shortlist)."""
    corpus, kcents = _train_kmeans(spark, sf)
    # r13: materialize — assigned is referenced by resid, queries, cand
    # here plus qv/exact in ann_ivfpq_rerank; un-materialized, every
    # reference re-ran the whole k-means chain (guide §3.3/§5)
    assigned = _km_assign(corpus, kcents).localCheckpoint(eager=True)

    resid = (
        assigned.join(F.broadcast(kcents), "cell")
        .select(
            "vec_id",
            F.col("cell").alias("kcell"),
            F.zip_with("vec", "cvec", lambda x, y: x - y).alias("rvec"),
        )
    )
    rsub = _resid_subvectors(resid, "rvec")  # (vec_id, kcell, m, svec)
    # per-cell init: the _PQ_K lowest vec_ids WITHIN each coarse cell
    rcents = (
        rsub.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("kcell", "m").orderBy("vec_id")),
        )
        .where(F.col("rn") <= _PQ_K)
        .select(
            "kcell", "m", (F.col("rn") - 1).cast("int").alias("cell"),
            F.col("svec").alias("cvec"),
        )
    )
    for _ in range(_PQ_ITERS):
        # r13: per-round materialization (see _train_kmeans_on)
        rcents = _rpq_recompute(_rpq_assign(rsub, rcents)).localCheckpoint(
            eager=True
        )
    rcodes = _rpq_assign(rsub, rcents).select("vec_id", "kcell", "m", "cell")

    queries = assigned.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    probed = (
        queries.crossJoin(F.broadcast(kcents))
        .withColumn("dist_r", F.round(d2, 6))
        .withColumn(
            "crank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("dist_r", "cell")
            ),
        )
        .where(F.col("crank") <= _IVFPQ_NPROBE)
        .select("query_id", "cell", "qvec")
        # r13: |queries| x nprobe rows, referenced by qresid AND cand
        .localCheckpoint(eager=True)
    )
    # per-probed-cell query residual -> per-cell distance table
    qresid = (
        probed.join(F.broadcast(kcents), "cell")
        .select(
            "query_id",
            F.col("cell").alias("kcell"),
            F.zip_with("qvec", "cvec", lambda x, y: x - y).alias("qr"),
        )
    )
    qrsub = _resid_subvectors(qresid, "qr").withColumnRenamed("svec", "qsvec")
    pd2 = F.aggregate(
        F.zip_with(F.col("qsvec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    dtab = qrsub.join(F.broadcast(rcents), ["kcell", "m"]).select(
        "query_id", "kcell", "m", "cell",
        F.round(pd2 * 1e6).cast("long").alias("d2_micro"),
    )
    cand = (
        assigned.join(F.broadcast(probed.select("query_id", "cell")), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.col("cell").alias("kcell"))
    )
    # candidate restriction FIRST, as in the raw-coded variant
    pairs = (
        cand.join(rcodes, ["vec_id", "kcell"])
        .join(F.broadcast(dtab), ["query_id", "kcell", "m", "cell"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2_micro").alias("adc_d2_micro"))
    )
    return pairs, assigned


def _salted_topk(scored: DataFrame, order, k: int) -> DataFrame:
    """Salted two-phase per-query top-k (the house pattern), returning
    rows with a final `rank` column."""
    salted = scored.withColumn(
        "_salt", F.pmod(F.hash(F.col("vec_id")), F.lit(_SALT_BUCKETS))
    )
    local = salted.withColumn(
        "_lr",
        F.row_number().over(W.partitionBy("query_id", "_salt").orderBy(*order)),
    ).where(F.col("_lr") <= k)
    return local.withColumn(
        "rank", F.row_number().over(W.partitionBy("query_id").orderBy(*order))
    ).where(F.col("rank") <= k)


def ann_ivfpq_residual(spark: SparkSession, sf: str) -> DataFrame:
    pairs, _ = _residual_adc_pairs(spark, sf)
    order = [F.col("adc_d2_micro").asc(), F.col("vec_id")]
    return _salted_topk(pairs, order, _TOP_K).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "adc_d2_micro", "rank"
    )


# Re-ranking (the standard IVF-PQ accuracy tail, e.g. FAISS's
# IndexRefineFlat): the ADC estimate orders a SHORTLIST of R
# candidates per query; their exact vectors are then fetched by
# equi-join and the final top-k uses true distances. Costs one extra
# join of |queries| x R rows against the corpus — R is a constant
# (4x k here), so the refinement stage's size is independent of
# corpus scale while recall strictly improves on the ADC ranking
# (test-asserted monotone in R and above the unrefined recall).
_RERANK_R = 4 * _TOP_K


def ann_ivfpq_rerank(spark: SparkSession, sf: str, r: int = _RERANK_R) -> DataFrame:
    pairs, assigned = _residual_adc_pairs(spark, sf)
    adc_order = [F.col("adc_d2_micro").asc(), F.col("vec_id")]
    shortlist = _salted_topk(pairs, adc_order, r).select("query_id", "vec_id")
    qv = assigned.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("vec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    exact = (
        shortlist.join(assigned.select("vec_id", "vec"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(d2 * 1e6).cast("long").alias("d2_micro"),
        )
    )
    order = [F.col("d2_micro").asc(), F.col("vec_id")]
    return _salted_topk(exact, order, _TOP_K).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "d2_micro", "rank"
    )


def _rpq_cte_list() -> list[str]:
    """The residual-IVF-PQ oracle CTE chain through ``pairs`` — shared
    by the ADC-ranked query and the exact-rerank query."""
    ctes, final_cent = _km_cte_chain()
    ctes.append(
        f"""resid AS (
  SELECT f.vec_id, f.cell AS kcell,
         list_transform(range(1, 65), j -> f.vec[j] - k.cvec[j]) AS rvec
  FROM finaln f JOIN {final_cent} k ON f.cell = k.cell
)"""
    )
    ctes.append(
        f"""rsub AS (
  SELECT vec_id, kcell, m,
         list_slice(rvec, m * {_PQ_SUBDIM} + 1, (m + 1) * {_PQ_SUBDIM}) AS svec
  FROM resid CROSS JOIN (SELECT unnest(range({_PQ_M})) AS m)
)"""
    )
    ctes.append(
        f"""rcent0 AS (
  SELECT kcell, m, CAST(rn - 1 AS INT) AS cell, svec AS cvec FROM (
    SELECT kcell, m, svec,
           row_number() OVER (PARTITION BY kcell, m ORDER BY vec_id) AS rn
    FROM rsub
  ) WHERE rn <= {_PQ_K}
)"""
    )

    def assign(cent_cte: str) -> str:
        return f"""(
  SELECT vec_id, kcell, m, cell, svec FROM (
    SELECT s.vec_id, s.kcell, s.m, c.cell, s.svec,
           row_number() OVER (
             PARTITION BY s.vec_id, s.kcell, s.m
             ORDER BY round(list_sum(list_transform(range(1, {_PQ_SUBDIM} + 1),
                        j -> (s.svec[j] - c.cvec[j]) * (s.svec[j] - c.cvec[j]))), 6),
                      c.cell) AS rn
    FROM rsub s JOIN {cent_cte} c ON s.kcell = c.kcell AND s.m = c.m
  ) WHERE rn = 1
)"""

    def recompute(assign_cte: str) -> str:
        return f"""(
  SELECT kcell, m, cell, list(mu ORDER BY dim) AS cvec FROM (
    SELECT kcell, m, cell, dim, round(avg(val), 6) AS mu
    FROM (SELECT kcell, m, cell, unnest(svec) AS val,
                 generate_subscripts(svec, 1) AS dim
          FROM {assign_cte})
    GROUP BY kcell, m, cell, dim
  ) GROUP BY kcell, m, cell
)"""

    prev = "rcent0"
    for i in range(1, _PQ_ITERS + 1):
        ctes.append(f"rassign{i} AS {assign(prev)}")
        ctes.append(f"rcent{i} AS {recompute(f'rassign{i}')}")
        prev = f"rcent{i}"
    ctes.append(
        f"rcodes AS (SELECT vec_id, kcell, m, cell FROM {assign(prev)})"
    )
    ctes.append(
        f"""ivfq AS (SELECT vec_id AS query_id, vec AS qvec
      FROM finaln WHERE vec_id < {_N_QUERIES})"""
    )
    ctes.append(
        f"""probed AS (
  SELECT query_id, cell, qvec FROM (
    SELECT q.query_id, ct.cell, q.qvec,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_sum(list_transform(range(1, 65),
                        j -> (q.qvec[j] - ct.cvec[j]) * (q.qvec[j] - ct.cvec[j]))), 6),
                      ct.cell) AS crank
    FROM ivfq q CROSS JOIN {final_cent} ct
  ) WHERE crank <= {_IVFPQ_NPROBE}
)"""
    )
    ctes.append(
        f"""qrsub AS (
  SELECT query_id, kcell, m,
         list_slice(qr, m * {_PQ_SUBDIM} + 1, (m + 1) * {_PQ_SUBDIM}) AS qsvec
  FROM (
    SELECT p.query_id, p.cell AS kcell,
           list_transform(range(1, 65), j -> p.qvec[j] - k.cvec[j]) AS qr
    FROM probed p JOIN {final_cent} k ON k.cell = p.cell
  ) CROSS JOIN (SELECT unnest(range({_PQ_M})) AS m)
)"""
    )
    ctes.append(
        f"""dtab AS (
  SELECT q.query_id, q.kcell, q.m, c.cell,
         CAST(round(list_sum(list_transform(range(1, {_PQ_SUBDIM} + 1),
                j -> (q.qsvec[j] - c.cvec[j]) * (q.qsvec[j] - c.cvec[j]))) * 1000000, 0)
              AS BIGINT) AS d2_micro
  FROM qrsub q JOIN {prev} c ON q.kcell = c.kcell AND q.m = c.m
)"""
    )
    ctes.append(
        """cand AS (
  SELECT p.query_id, f.vec_id, p.cell AS kcell
  FROM finaln f JOIN probed p ON f.cell = p.cell AND f.vec_id <> p.query_id
)"""
    )
    ctes.append(
        """pairs AS (
  SELECT c.query_id, c.vec_id,
         CAST(sum(d.d2_micro) AS BIGINT) AS adc_d2_micro
  FROM cand c
  JOIN rcodes co ON co.vec_id = c.vec_id AND co.kcell = c.kcell
  JOIN dtab d ON d.query_id = c.query_id AND d.kcell = co.kcell
             AND d.m = co.m AND d.cell = co.cell
  GROUP BY c.query_id, c.vec_id
)"""
    )
    return ctes


def _rpq_sql() -> str:
    return (
        "WITH "
        + ",\n".join(_rpq_cte_list())
        + f"""
SELECT query_id, vec_id AS neighbor_id, adc_d2_micro, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc_d2_micro ASC, vec_id) AS INT) AS rank
  FROM pairs
) WHERE rank <= {_TOP_K}
"""
    )


def _rerank_sql(r: int = _RERANK_R) -> str:
    ctes = _rpq_cte_list()
    ctes.append(
        f"""shortlist AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_d2_micro ASC, vec_id) AS arank
    FROM pairs
  ) WHERE arank <= {r}
)"""
    )
    ctes.append(
        """exact AS (
  SELECT s.query_id, s.vec_id,
         CAST(round(list_sum(list_transform(range(1, 65),
                j -> (q.vec[j] - f.vec[j]) * (q.vec[j] - f.vec[j]))) * 1000000, 0)
              AS BIGINT) AS d2_micro
  FROM shortlist s
  JOIN finaln f ON f.vec_id = s.vec_id
  JOIN finaln q ON q.vec_id = s.query_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, vec_id AS neighbor_id, d2_micro, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY d2_micro ASC, vec_id) AS INT) AS rank
  FROM exact
) WHERE rank <= {_TOP_K}
"""
    )


def _ivfpq_sql() -> str:
    ctes, final_cent = _km_cte_chain()
    ctes += _pq_cte_chain(include_corpus=False)
    ctes.append(
        f"""ivfq AS (SELECT vec_id AS query_id, vec AS qvec
      FROM finaln WHERE vec_id < {_N_QUERIES})"""
    )
    ctes.append(
        f"""probed AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, ct.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_sum(list_transform(range(1, 65),
                        j -> (q.qvec[j] - ct.cvec[j]) * (q.qvec[j] - ct.cvec[j]))), 6),
                      ct.cell) AS crank
    FROM ivfq q CROSS JOIN {final_cent} ct
  ) WHERE crank <= {_IVFPQ_NPROBE}
)"""
    )
    ctes.append(
        """cand AS (
  SELECT p.query_id, f.vec_id
  FROM finaln f JOIN probed p ON f.cell = p.cell AND f.vec_id <> p.query_id
)"""
    )
    ctes.append(
        """pairs AS (
  SELECT c.query_id, co.vec_id,
         CAST(sum(d.d2_micro) AS BIGINT) AS adc_d2_micro
  FROM cand c JOIN codes co ON co.vec_id = c.vec_id
       JOIN dtab d ON d.query_id = c.query_id
                  AND d.m = co.m AND d.cell = co.cell
  GROUP BY c.query_id, co.vec_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, vec_id AS neighbor_id, adc_d2_micro, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc_d2_micro ASC, vec_id) AS INT) AS rank
  FROM pairs
) WHERE rank <= {_TOP_K}
"""
    )


QUERIES = {
    "ann_cosine_top5": QuerySpec(ann_cosine_top5, ANN_BRUTE_SQL),
    "ann_ivf_label_probe": QuerySpec(ann_ivf_label_probe, ANN_IVF_SQL),
    "ann_ivf_kmeans": QuerySpec(ann_ivf_kmeans, _km_sql()),
    "ann_pq_adc": QuerySpec(ann_pq_adc, _pq_sql()),
    "embedding_int8_quant": QuerySpec(embedding_int8_quant, INT8_QUANT_SQL),
    "embedding_centroids": QuerySpec(embedding_centroids, CENTROID_SQL),
    "embedding_pca_top1": QuerySpec(embedding_pca_top1, _pca_sql()),
    "ann_ivf_recall": QuerySpec(ann_ivf_recall, _recall_sql()),
    "ann_ivf_multiprobe": QuerySpec(ann_ivf_multiprobe, _multiprobe_sql()),
    "ann_ivfpq_adc": QuerySpec(ann_ivfpq_adc, _ivfpq_sql()),
    "ann_ivfpq_residual": QuerySpec(ann_ivfpq_residual, _rpq_sql()),
    "ann_ivfpq_rerank": QuerySpec(ann_ivfpq_rerank, _rerank_sql()),
}
