"""Signed-random-projection LSH (SRP) for embedding near-dup/similarity —
the standard LSH family for cosine distance, and the scale path when
there is no precomputed quantization key to block on.

Construction (Charikar 2002): hyperplane r_i has Rademacher (±1)
components derived deterministically from md5(i|dim) at module-import
time, so BOTH engines receive the planes as literals and compute the
identical 16-bit signature: bit_i = [dot(v, r_i) > 0]. Candidates =
pairs sharing the full signature bucket (plus 4-bit band probes);
verification = exact cosine.

Scale: signature computation is one pass over the vector per plane (16
fused dot products per row, JVM-side zip_with/aggregate); the bucket
join is an equi-join; only candidates pay the exact cosine.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_N_PLANES = 16
_DIM = 64
_VARIANT_OFFSET = 100000
_COSINE_THRESHOLD = 0.99


def _rademacher(plane: int, dim: int) -> int:
    h = hashlib.md5(f"{plane}|{dim}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 1 else -1

_PLANES = [[_rademacher(i, d) for d in range(_DIM)] for i in range(_N_PLANES)]


def _corpus(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select("vec_id", dbl.alias("vec"))
    variant = e.select(
        (F.col("vec_id") + _VARIANT_OFFSET).alias("vec_id"),
        F.transform(dbl, lambda x, i: F.when(i == 0, x * 1.01).otherwise(x)).alias("vec"),
    )
    return base.unionByName(variant)


def dedup_srp_lsh(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _corpus(spark, sf)

    def dot_plane(plane: list[int]):
        arr = F.array(*[F.lit(float(c)) for c in plane])
        return F.aggregate(
            F.zip_with(F.col("vec"), arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sig_col = None
    for i, plane in enumerate(_PLANES):
        term = F.when(dot_plane(plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig_col = term if sig_col is None else sig_col + term
    norm = F.sqrt(F.aggregate(F.col("vec"), F.lit(0.0), lambda a, x: a + x * x))
    sig = corpus.select(
        "vec_id", "vec", norm.alias("nrm"), sig_col.cast("int").alias("sig")
    ).cache()

    # candidates: same full 16-bit signature (near-identical vectors flip
    # no plane with overwhelming probability at cosine >= 0.99)
    cand = (
        sig.alias("a")
        .join(sig.alias("b"), F.col("a.sig") == F.col("b.sig"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
            F.col("a.nrm").alias("na"),
            F.col("b.nrm").alias("nb"),
        )
    )
    return (
        cand.withColumn(
            "cosine",
            F.round(
                F.aggregate(
                    F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (F.col("na") * F.col("nb")),
                4,
            ),
        )
        .where(F.col("cosine") >= _COSINE_THRESHOLD)
        .select("vec_a", "vec_b", "cosine")
    )


def _srp_sql() -> str:
    plane_terms = []
    for i, plane in enumerate(_PLANES):
        coeffs = ", ".join(f"{float(c)}" for c in plane)
        plane_terms.append(
            f"CASE WHEN list_sum(list_transform(range(1, {_DIM + 1}), "
            f"j -> vec[j] * ([{coeffs}])[j])) > 0 THEN {1 << i} ELSE 0 END"
        )
    sig_expr = " + ".join(plane_terms)
    return f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
  UNION ALL
  SELECT vec_id + {_VARIANT_OFFSET},
         list_transform(CAST(embedding AS DOUBLE[]),
                        (x, i) -> CASE WHEN i = 1 THEN x * 1.01 ELSE x END)
  FROM embeddings
),
sig AS (
  SELECT vec_id, vec,
         sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm,
         CAST({sig_expr} AS INT) AS sig
  FROM corpus
),
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.vec AS va, b.vec AS vb, a.nrm AS na, b.nrm AS nb
  FROM sig a JOIN sig b ON a.sig = b.sig
  WHERE a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       round(list_sum(list_transform(range(1, {_DIM + 1}), j -> va[j] * vb[j]))
             / (na * nb), 4) AS cosine
FROM cand
WHERE list_sum(list_transform(range(1, {_DIM + 1}), j -> va[j] * vb[j])) / (na * nb)
      >= {_COSINE_THRESHOLD}
"""


QUERIES = {
    "dedup_srp_lsh": QuerySpec(dedup_srp_lsh, _srp_sql()),
}
