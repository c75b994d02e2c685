"""Incremental SemDeDup: stream new embedding vectors against a
persisted kept-vector index — the always-on ingest side of the batch
``queries.semdedup_q`` operator, completing the streaming counterpart
set (minhash: ``incremental_dedup``, exact substring:
``incremental_substr``, BM25: ``incremental_bm25``, aggregates:
``mv_sink``).

At 100 TB you do not re-cluster and re-pair the corpus per crawl; the
persisted state is (a) the coarse k-means centroids trained ONCE on
the initial corpus (tiny, broadcast) and (b) the kept vectors per
cell. Each arriving batch:

1. assigns its vectors to cells with the broadcast centroids (the
   shared ``similarity_q._km_assign`` — batch-sized work);
2. drops a vector with cosine >= tau to ANY kept index vector in its
   cell, or to an earlier-ordered surviving check within the batch
   (the same greedy triangular-mask rule as the batch operator, with
   "already indexed" counting as earlier — the natural ingest-time
   ordering);
3. appends only the SURVIVORS to the kept index, so later arrivals
   dedup against earlier stream arrivals too.

Pair work per batch is bounded by (batch x kept-per-cell) inside each
cell — cells bound the stage exactly as in the batch operator; K grows
with corpus size in production (paper: K ~ sqrt(N)).

Directionality note (inherent to ingest-time dedup, same as the other
incremental variants): only NEW vectors are flagged, and the kept set
depends on arrival order — a batch operator re-run decides keepers
globally by centroid-similarity order instead. This path answers "is
this incoming item a semantic duplicate of anything we kept" at
batch-sized cost.

Replay idempotence: flags and kept-vector writes land under
``batch_id=N`` partitions with overwrite, and the probe reads the
index with ``batch_id != N`` — an at-least-once redelivery rewrites
its own partition and cannot drop the whole batch against its own
first attempt.

Drift: centroids trained once go stale as stream content drifts — new
content far from every initial cell piles into whichever cell is
nearest, inflating that cell's pair stage and weakening the dedup
(near-identical drifted vectors still meet in the one cell, but its
bound degrades toward corpus-sized). ``refresh_centroids`` is the
version boundary: retrain on the CURRENT kept index, reassign every
kept vector, rewrite the index under the same batch_id partitioning
(so replay idempotence survives the refresh untouched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.semdedup_q import _TAU
from ..queries.similarity_q import _dot, _km_assign, _norm, _train_kmeans_on

_VEC_SCHEMA = "vec_id long, vec array<double>"


def init_semdedup_state(
    corpus: DataFrame, cents_dir: str, kept_dir: str, tau: float = _TAU
) -> None:
    """Train centroids on the initial corpus, run the batch greedy rule
    over it (via the empty-index fold path), persist centroids +
    initial keepers under batch_id=-1."""
    cents = _train_kmeans_on(corpus)
    cents.write.mode("overwrite").parquet(cents_dir)
    spark = corpus.sparkSession
    empty = spark.createDataFrame([], _VEC_SCHEMA + ", cell int")
    flags = _flag_batch(corpus, cents, empty, tau)
    (
        flags.where(~F.col("dropped"))
        .select("vec_id", "vec", "cell")
        .write.mode("overwrite")
        .parquet(f"{kept_dir}/batch_id=-1")
    )


def _flag_batch(
    batch: DataFrame, cents: DataFrame, kept: DataFrame, tau: float
) -> DataFrame:
    """(vec_id, vec, cell, csim, dropped) for the batch against the
    kept index + itself (greedy: index members count as earlier)."""
    assigned = _km_assign(batch, cents)
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
    )
    ki = kept.select(
        F.col("cell"),
        F.col("vec").alias("kvec"),
        _norm(F.col("vec")).alias("knrm"),
    )
    cos_k = F.round(
        _dot(F.col("vec"), F.col("kvec")) / (F.col("nrm") * F.col("knrm")), 4
    )
    drop_vs_index = (
        r.join(ki, "cell")
        .where(cos_k >= tau)
        .select("vec_id")
        .distinct()
    )
    a, b = r.alias("a"), r.alias("b")
    earlier = (F.col("b.csim") < F.col("a.csim")) | (
        (F.col("b.csim") == F.col("a.csim"))
        & (F.col("b.vec_id") < F.col("a.vec_id"))
    )
    cos_b = F.round(
        _dot(F.col("a.vec"), F.col("b.vec"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        4,
    )
    drop_in_batch = (
        a.join(b, (F.col("a.cell") == F.col("b.cell")) & earlier)
        .where(cos_b >= tau)
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )
    dropped = (
        drop_vs_index.unionByName(drop_in_batch)
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return (
        r.join(dropped, "vec_id", "left")
        .select(
            "vec_id", "vec", "cell", "csim",
            F.coalesce("dropped", F.lit(False)).alias("dropped"),
        )
    )


def refresh_centroids(
    spark: SparkSession, cents_dir: str, kept_dir: str, k: int | None = None
) -> None:
    """Retrain the coarse centroids on the CURRENT kept index and
    reassign every kept vector — run on a version boundary (every N
    batches / on a drift alarm), between micro-batches.

    Seeding: the k NEWEST kept ids, re-labelled 0..k-1. Drift is the
    reason a refresh runs, and Lloyd iterations can only move cells,
    never split one — seeding from the oldest ids re-picks the stale
    directions and leaves the whole drifted region in a single cell
    (observed while building the test); the newest keepers ARE the
    drifted region. Dedup correctness never depends on seeding (near-
    identical vectors share a nearest centroid under any centroids);
    seeding only controls how tight the cell BOUNDS stay. The kept
    index is rewritten under its existing batch_id partitioning, so
    the ``batch_id != N`` replay guard keeps working across the
    refresh."""
    from ..queries.similarity_q import _KM_ITERS, _KM_K, _km_recompute

    k = _KM_K if k is None else k
    kept = spark.read.parquet(kept_dir).select("batch_id", "vec_id", "vec")
    corpus = kept.select("vec_id", "vec")
    # k seed rows: newest ids present, labelled 0..k-1 (window over a
    # k-row frame — TakeOrdered k, never corpus-sized)
    from pyspark.sql import Window as W

    seeds = (
        corpus.orderBy(F.col("vec_id").desc())
        .limit(k)
        .withColumn(
            "cell",
            (F.row_number().over(W.orderBy(F.col("vec_id").desc())) - 1).cast(
                "int"
            ),
        )
        .select("cell", F.col("vec").alias("cvec"))
    )
    cents = seeds
    for _ in range(_KM_ITERS):
        cents = _km_recompute(_km_assign(corpus, cents))
    # write-aside then swap (the mv_sink version-dir pattern): the new
    # index's lineage READS the old files, so an in-place overwrite
    # would consume its own input — and a driver-side collect to break
    # lineage would pull the corpus-sized index through the driver
    import shutil

    cents_tmp, kept_tmp = cents_dir + "__refresh", kept_dir + "__refresh"
    cents.write.mode("overwrite").parquet(cents_tmp)
    new_cents = spark.read.parquet(cents_tmp)
    (
        _km_assign(corpus, new_cents)
        .join(kept.select("batch_id", "vec_id"), "vec_id")
        .select("batch_id", "vec_id", "vec", "cell")
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(kept_tmp)
    )
    for src, dst in ((cents_tmp, cents_dir), (kept_tmp, kept_dir)):
        shutil.rmtree(dst, ignore_errors=True)
        shutil.move(src, dst)


def make_fold(
    spark: SparkSession,
    cents_dir: str,
    kept_dir: str,
    flags_out_dir: str,
    tau: float = _TAU,
):
    """The foreachBatch body, exposed for direct replay testing."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        cents = spark.read.parquet(cents_dir)
        kept = (
            spark.read.parquet(kept_dir)
            .where(F.col("batch_id") != batch_id)
            .select("vec_id", "vec", "cell")
        )
        flags = _flag_batch(batch_df, cents, kept, tau)
        flags.select("vec_id", "cell", "csim", "dropped").write.mode(
            "overwrite"
        ).parquet(f"{flags_out_dir}/batch_id={batch_id}")
        (
            flags.where(~F.col("dropped"))
            .select("vec_id", "vec", "cell")
            .write.mode("overwrite")
            .parquet(f"{kept_dir}/batch_id={batch_id}")
        )

    return fold


def stream_semdedup(
    spark: SparkSession,
    vecs_dir: str,
    cents_dir: str,
    kept_dir: str,
    flags_out_dir: str,
    ckpt: str,
    tau: float = _TAU,
):
    """File-source stream of (vec_id, vec) deduplicated per
    micro-batch against the kept index; survivors grow the index."""
    fold = make_fold(spark, cents_dir, kept_dir, flags_out_dir, tau)
    stream = spark.readStream.schema(_VEC_SCHEMA).parquet(vecs_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
