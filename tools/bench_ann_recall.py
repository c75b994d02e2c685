"""IVF recall-at-scale harness (r11 verdict item 6): measure recall@5
and probe runtime on a SCALED embeddings corpus with the cell count
grown ~ sqrt(N) — the SCALE.md lever — confirming probe quality does not
collapse as cells multiply.

The gate query (`ann_ivf_recall`) proves recall cross-engine at driver
SFs with the precomputed label cells; this harness re-asks the question
at bench scale with REAL k-means cells: train the shared deterministic
Lloyd trainer at k ~ sqrt(N), rank cells per query by centroid
distance, probe the nprobe nearest (1/2/4), and report recall@5 against
exact brute force plus build/exact/probe wall times.

Usage: python tools/bench_ann_recall.py [dir] [k_cells] [n_queries]
Defaults: /tmp/spark_graft_scaled_64x, k = round(sqrt(N)), 50 queries.
Prints one JSON line. Bench-only (no oracle; the correctness gate stays
on driver SFs).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from composable_logs_spark.queries.similarity_q import (
    _TOP_K,
    _as_double,
    _dot,
    _km_assign,
    _norm,
    _train_kmeans_on,
)
from composable_logs_spark.session import get_spark

DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scaled_64x"
NPROBES = [1, 2, 4]


def main() -> None:
    spark = get_spark("bench_ann_recall")
    spark.sparkContext.setLogLevel("ERROR")

    # repartition to full width BEFORE caching: the single-file scaled
    # parquet arrives as ~8 splits, and every Lloyd round's assign stage
    # (N x k distance evaluations, the dominant cost) would otherwise run
    # 8-wide on a 32-core box — the 3db3865 parallelism-floor lesson in
    # cached-frame form. One cheap shuffle, paid once.
    corpus = (
        spark.read.parquet(f"{DIR}/embeddings.parquet")
        .select("vec_id", _as_double(F.col("embedding")).alias("vec"))
        .repartition(spark.sparkContext.defaultParallelism)
        .cache()
    )
    n = corpus.count()
    k = int(sys.argv[2]) if len(sys.argv) > 2 else max(8, round(math.sqrt(n)))
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    # ---- index build: Lloyd k-means at k ~ sqrt(N), then assignment --
    t0 = time.time()
    cents = _train_kmeans_on(corpus, k)
    final = (
        _km_assign(corpus, cents)
        .withColumn("norm", _norm(F.col("vec")))
        .cache()
    )
    final.write.format("noop").mode("overwrite").save()
    build_s = time.time() - t0

    # query set: the n_queries lowest vec_ids (replica-0 originals)
    qids = [r[0] for r in corpus.select("vec_id").orderBy("vec_id").limit(n_queries).collect()]
    queries = final.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )

    # ---- exact brute force (the recall denominator) -------------------
    t0 = time.time()
    scored = (
        final.join(F.broadcast(queries), final["vec_id"] != queries["query_id"])
        .withColumn(
            "cosine",
            F.round(_dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4),
        )
        .withColumn("salt", F.pmod(F.hash("vec_id"), F.lit(32)))
    )
    local = scored.withColumn(
        "r",
        F.row_number().over(W.partitionBy("query_id", "salt").orderBy(F.desc("cosine"), "vec_id")),
    ).where(F.col("r") <= _TOP_K)
    exact = (
        local.withColumn(
            "rank",
            F.row_number().over(W.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")),
        )
        .where(F.col("rank") <= _TOP_K)
        .select("query_id", F.col("vec_id").alias("true_neighbor"))
        .cache()
    )
    exact.write.format("noop").mode("overwrite").save()
    exact_s = time.time() - t0

    # ---- IVF probe: nprobe nearest cells per query ---------------------
    t0 = time.time()
    d2 = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    probed = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("dist_r", F.round(d2, 6))
        .withColumn("crank", F.row_number().over(W.partitionBy("query_id").orderBy("dist_r", "cell")))
        .where(F.col("crank") <= max(NPROBES))
        .select("query_id", "qvec", "qnorm", "cell", "crank")
    )
    cand = (
        final.join(F.broadcast(probed), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "crank")
    )
    nprobe = spark.createDataFrame([(p,) for p in NPROBES], "nprobe int")
    ranked = (
        cand.join(F.broadcast(nprobe), F.col("crank") <= F.col("nprobe"))
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("nprobe", "query_id").orderBy(F.desc("cosine"), "neighbor_id")
            ),
        )
        .where(F.col("rank") <= _TOP_K)
        .select(
            F.col("nprobe").alias("r_nprobe"),
            F.col("query_id").alias("r_query"),
            F.col("neighbor_id").alias("r_neighbor"),
        )
        .cache()
    )
    ranked.write.format("noop").mode("overwrite").save()
    probe_s = time.time() - t0

    base = exact.crossJoin(F.broadcast(nprobe))
    rec = (
        base.join(
            ranked,
            (base["nprobe"] == ranked["r_nprobe"])
            & (base["query_id"] == ranked["r_query"])
            & (base["true_neighbor"] == ranked["r_neighbor"]),
            "left",
        )
        .groupBy("nprobe")
        .agg(F.round(F.count("r_neighbor") / (F.lit(float(_TOP_K)) * n_queries), 4).alias("recall"))
        .orderBy("nprobe")
        .collect()
    )
    print(
        json.dumps(
            {
                "dir": DIR,
                "n_vectors": n,
                "k_cells": k,
                "n_queries": n_queries,
                "build_s": round(build_s, 1),
                "exact_s": round(exact_s, 1),
                "probe_s_all_nprobes": round(probe_s, 1),
                "recall_at_5": {str(r["nprobe"]): r["recall"] for r in rec},
            }
        )
    )


if __name__ == "__main__":
    main()
